"""Unit vectors for uint32 Montgomery arithmetic (oracle: Python ints).

Mirrors the role of SEAL's util tests
(reference: thirdparty/SEAL-4.1-bs/native/tests/seal/util/uintarithsmallmod.cpp).
"""

import numpy as np
import jax.numpy as jnp

from moai_tpu import mod_arith as ma
from moai_tpu.primes import ntt_primes_near


RNG = np.random.default_rng(0)


def test_mul_full_u32_exhaustive_random():
    a = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64)
    b = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64)
    hi, lo = ma.mul_full_u32(jnp.asarray(a.astype(np.uint32)),
                             jnp.asarray(b.astype(np.uint32)))
    got = (np.asarray(hi, dtype=np.uint64) << 32) | np.asarray(lo, dtype=np.uint64)
    assert np.array_equal(got, a * b)  # uint64 wraps exactly like 64-bit product


def test_mul_full_edge_cases():
    for av, bv in [(0, 0), (0xFFFFFFFF, 0xFFFFFFFF), (1, 0xFFFFFFFF),
                   (0x10000, 0x10000), (0xFFFF, 0x10001)]:
        hi, lo = ma.mul_full_u32(jnp.uint32(av), jnp.uint32(bv))
        got = (int(hi) << 32) | int(lo)
        assert got == av * bv, (av, bv)


def test_mont_mul_matches_int_math():
    for q in ntt_primes_near(29.5, 2 ** 13, 3) + ntt_primes_near(21.0, 2 ** 13, 2):
        c = ma.mont_constants(q)
        a = RNG.integers(0, q, size=2048, dtype=np.uint64)
        b = RNG.integers(0, q, size=2048, dtype=np.uint64)
        am = (a << np.uint64(32)) % np.uint64(q)
        bm = (b << np.uint64(32)) % np.uint64(q)
        got = ma.mont_mul(jnp.asarray(am.astype(np.uint32)),
                          jnp.asarray(bm.astype(np.uint32)),
                          jnp.uint32(q), jnp.uint32(c["qneg_inv"]))
        want = (a * b % np.uint64(q) << np.uint64(32)) % np.uint64(q)
        assert np.array_equal(np.asarray(got, dtype=np.uint64), want), q


def test_to_from_mont_roundtrip_and_lazy_inputs():
    q = ntt_primes_near(26.0, 2 ** 13, 1)[0]
    c = ma.mont_constants(q)
    # arbitrary uint32 inputs, including values far above q
    x = RNG.integers(0, 1 << 32, size=1024, dtype=np.uint64)
    xm = ma.to_mont(jnp.asarray(x.astype(np.uint32)), jnp.uint32(q),
                    jnp.uint32(c["qneg_inv"]), jnp.uint32(c["r2"]))
    back = ma.from_mont(xm, jnp.uint32(q), jnp.uint32(c["qneg_inv"]))
    assert np.array_equal(np.asarray(back, dtype=np.uint64), x % np.uint64(q))


def test_add_sub_neg():
    q = ntt_primes_near(28.0, 2 ** 13, 1)[0]
    a = RNG.integers(0, q, size=512, dtype=np.uint64)
    b = RNG.integers(0, q, size=512, dtype=np.uint64)
    aj = jnp.asarray(a.astype(np.uint32))
    bj = jnp.asarray(b.astype(np.uint32))
    qq = jnp.uint32(q)
    assert np.array_equal(np.asarray(ma.add_mod(aj, bj, qq), np.uint64),
                          (a + b) % np.uint64(q))
    assert np.array_equal(np.asarray(ma.sub_mod(aj, bj, qq), np.int64),
                          (a.astype(np.int64) - b.astype(np.int64)) % q)
    assert np.array_equal(np.asarray(ma.neg_mod(aj, qq), np.uint64),
                          (np.uint64(q) - a) % np.uint64(q))


def test_shoup_mul_exact():
    """shoup_mul(x, w, w') == x*w mod q for arbitrary uint32 x and
    precomputed w < q (the twiddle/fold fast path)."""
    import jax.numpy as jnp
    q = ntt_primes_near(29.9, 2 ** 13, 1)[0]     # worst case: q near 2^30
    x = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64)
    w = RNG.integers(0, q, size=4096, dtype=np.uint64)
    ws = ((w << np.uint64(32)) // np.uint64(q)).astype(np.uint32)
    got = ma.shoup_mul(jnp.asarray(x.astype(np.uint32)),
                       jnp.asarray(w.astype(np.uint32)),
                       jnp.asarray(ws), jnp.uint32(q))
    assert np.array_equal(np.asarray(got, np.uint64), x * w % np.uint64(q))
