"""Native host library: exact encode/decode + independent NTT oracle
(native/moai_host.cpp; reference: SEAL's big-int encode rounding,
ckks.h:457-560, and the util/ntt.* test oracle)."""

import numpy as np
import pytest

from moai_tpu import native
from moai_tpu.primes import ntt_primes_near, primitive_root_2n

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

RNG = np.random.default_rng(3)
N = 64
QS = ntt_primes_near(30.0, 2 * N, 3)


def test_encode_exact_beyond_int64():
    coeffs = RNG.uniform(-1, 1, N) * 2 ** 80
    r = native.encode_residues(coeffs, QS)
    for i, q in enumerate(QS):
        want = np.array([int(round(c)) % q for c in coeffs], np.uint32)
        assert np.array_equal(r[..., i, :], want)


def test_decode_centered_exact():
    coeffs = RNG.uniform(-1, 1, N) * 2 ** 80
    r = native.encode_residues(coeffs, QS)
    dec = native.decode_centered(r, QS)
    Q = int(np.prod([int(q) for q in QS], dtype=object))
    for c, d in zip(coeffs, dec):
        v = int(round(c)) % Q
        v = v if v <= Q // 2 else v - Q
        assert d == float(v)


def test_ntt_oracle_roundtrip_and_convolution():
    q = QS[0]
    psi = primitive_root_2n(q, 2 * N)
    x = RNG.integers(0, q, (3, N)).astype(np.uint64)
    y = native.ntt_oracle(x, q, psi)
    assert np.array_equal(native.ntt_oracle(y, q, psi, inverse=True), x)
    # pointwise product = negacyclic convolution
    a, b = x[0], x[1]
    ya = native.ntt_oracle(a, q, psi).astype(object)
    yb = native.ntt_oracle(b, q, psi).astype(object)
    conv = native.ntt_oracle(((ya * yb) % q).astype(np.uint64), q, psi,
                             inverse=True)
    bf = np.zeros(N, object)
    for i in range(N):
        for j in range(N):
            k, s = i + j, int(a[i]) * int(b[j])
            if k >= N:
                bf[k - N] = (bf[k - N] - s) % q
            else:
                bf[k] = (bf[k] + s) % q
    assert np.array_equal(conv.astype(object), bf)


def test_encoder_big_scale_roundtrip():
    """Encoder exact path engages past the int64 window (scale 2^70)."""
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    cfg = CKKSConfig(logN=7, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=4, n_boot_levels=0, dnum=2,
                     hamming_weight=16)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    vals = RNG.uniform(-1, 1, cfg.slots)
    scale = 2.0 ** 70
    res = enc.encode(vals, scale=scale)
    got = enc.decode(res, scale=scale).real
    assert np.abs(got - vals).max() < 1e-9
