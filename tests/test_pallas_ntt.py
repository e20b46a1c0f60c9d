"""Pallas NTT kernel correctness (interpreter mode, CPU): bit-exact
against the jnp 4-step path, roundtrip, and limb-sliced dispatch.

On real TPU the same kernel runs compiled (ntt.py dispatch for
N >= 2^14); tools/bench_ntt.py covers the compiled path + timing."""

import numpy as np
import pytest

from moai_tpu.ntt import NttTables, ntt, intt
from moai_tpu.pallas_ntt import PallasNttTables, ntt_pallas, intt_pallas
from moai_tpu.primes import ntt_primes_near

RNG = np.random.default_rng(4)


@pytest.fixture(scope="module")
def tables():
    logN = 9
    qs = ntt_primes_near(26.0, 2 * (1 << logN), 4)
    nt = NttTables(logN, qs)
    return nt, nt.device(), PallasNttTables(nt).device(), qs


def _rand(qs, shape_lead, N):
    x = np.empty(shape_lead + (len(qs), N), np.uint32)
    for i, q in enumerate(qs):
        x[..., i, :] = RNG.integers(0, q, size=shape_lead + (N,))
    return x


def test_forward_matches_jnp(tables):
    import jax.numpy as jnp
    nt, tb, tbp, qs = tables
    x = jnp.asarray(_rand(qs, (3,), nt.N))
    assert np.array_equal(np.asarray(ntt(x, tb)),
                          np.asarray(ntt_pallas(x, tbp, interpret=True)))


def test_roundtrip_and_inverse_match(tables):
    import jax.numpy as jnp
    nt, tb, tbp, qs = tables
    x = _rand(qs, (2,), nt.N)
    xj = jnp.asarray(x)
    fwd = ntt_pallas(xj, tbp, interpret=True)
    assert np.array_equal(np.asarray(intt(fwd, tb)),
                          np.asarray(intt_pallas(fwd, tbp, interpret=True)))
    assert np.array_equal(
        np.asarray(intt_pallas(fwd, tbp, interpret=True)), x)


def test_limb_slice(tables):
    import jax.numpy as jnp
    nt, tb, tbp, qs = tables
    x = jnp.asarray(_rand(qs, (), nt.N))
    got = ntt_pallas(x[1:3], tbp, limb_slice=(1, 3), interpret=True)
    want = ntt(x[1:3], tb, limb_slice=(1, 3))
    assert np.array_equal(np.asarray(got), np.asarray(want))
