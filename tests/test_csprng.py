"""SHAKE-256 DRBG sampler tests (reference randomness stack:
util/blake2*.c, fips202.c, rlwe.cpp:46-58)."""

import numpy as np

from moai_tpu.csprng import ShakeRng


def test_deterministic_per_seed():
    assert np.array_equal(ShakeRng(42)._u64(256), ShakeRng(42)._u64(256))
    assert not np.array_equal(ShakeRng(42)._u64(64), ShakeRng(43)._u64(64))


def test_integers_range_and_shape():
    r = ShakeRng(1)
    v = r.integers(0, 97, size=(10, 11))
    assert v.shape == (10, 11) and v.min() >= 0 and v.max() < 97
    s = int(r.integers(1 << 62))
    assert 0 <= s < (1 << 62)


def test_normal_moments():
    z = ShakeRng(7).normal(0.0, 3.2, 200000)
    assert abs(z.mean()) < 0.05
    assert abs(z.std() - 3.2) < 0.05


def test_choice_without_replacement():
    c = ShakeRng(9).choice(1000, size=192, replace=False)
    assert len(set(c.tolist())) == 192
    assert c.min() >= 0 and c.max() < 1000


def test_ternary_choice():
    v = ShakeRng(3).choice(np.array([-1, 0, 1]), size=(4, 100))
    assert v.shape == (4, 100)
    assert set(np.unique(v).tolist()) <= {-1, 0, 1}
