"""NTT correctness: roundtrip, brute-force DFT oracle, negacyclic convolution.

Mirrors the role of SEAL's NTT tests
(reference: thirdparty/SEAL-4.1-bs/native/tests/seal/util/ntt.cpp).
"""

import numpy as np
import jax.numpy as jnp

from moai_tpu import mod_arith as ma
from moai_tpu.ntt import NttTables, ntt, intt
from moai_tpu.primes import ntt_primes_near

RNG = np.random.default_rng(1)


def _mont(x, q):
    return (x.astype(np.uint64) * np.uint64((1 << 32) % q) % np.uint64(q)).astype(np.uint32)


def _unmont(x, q):
    rinv = pow(1 << 32, -1, q)
    return (np.asarray(x, np.uint64) * np.uint64(rinv) % np.uint64(q)).astype(np.uint64)


def _brute_negacyclic_ntt(x, psi, q):
    """X[k] = sum_j x_j psi^((2k+1) j) mod q — O(N^2), Python ints."""
    n = len(x)
    out = []
    for k in range(n):
        e = pow(psi, 2 * k + 1, q)
        acc, cur = 0, 1
        for j in range(n):
            acc = (acc + int(x[j]) * cur) % q
            cur = cur * e % q
        out.append(acc)
    return np.array(out, dtype=np.uint64)


def test_ntt_matches_bruteforce_small():
    logN, N = 6, 64
    qs = ntt_primes_near(26.0, 2 * N, 2)
    tb = NttTables(logN, qs)
    tbd = tb.device()
    x = RNG.integers(0, min(qs), size=(len(qs), N), dtype=np.uint64)
    xm = np.stack([_mont(x[i], q) for i, q in enumerate(qs)])
    y = ntt(jnp.asarray(xm), tbd)
    for i, q in enumerate(qs):
        got = _unmont(y[i], q)
        want = _brute_negacyclic_ntt(x[i], tb.psi[i], q)
        assert np.array_equal(got, want), f"limb {i}"


def test_ntt_intt_roundtrip_batched():
    logN, N = 10, 1024
    qs = ntt_primes_near(29.0, 2 * N, 3)
    tb = NttTables(logN, qs)
    tbd = tb.device()
    x = np.stack([RNG.integers(0, q, size=(4, N), dtype=np.uint32)
                  for q in qs], axis=1)          # [batch=4, L, N]
    xj = jnp.asarray(x)
    back = intt(ntt(xj, tbd), tbd)
    assert np.array_equal(np.asarray(back), x)


def test_ntt_pointwise_is_negacyclic_convolution():
    logN, N = 5, 32
    q = ntt_primes_near(24.0, 2 * N, 1)[0]
    tb = NttTables(logN, [q])
    tbd = tb.device()
    a = RNG.integers(0, q, size=N, dtype=np.int64)
    b = RNG.integers(0, q, size=N, dtype=np.int64)
    # plain negacyclic product mod (x^N + 1)
    want = np.zeros(N, dtype=object)
    for i in range(N):
        for j in range(N):
            k = i + j
            s = 1
            if k >= N:
                k -= N
                s = -1
            want[k] = (want[k] + s * int(a[i]) * int(b[j])) % q
    am = _mont(a.astype(np.uint64), q)[None]
    bm = _mont(b.astype(np.uint64), q)[None]
    c = ma.mont_constants(q)
    qq = jnp.asarray(np.array([q], np.uint32).reshape(1, 1))
    qneg = jnp.asarray(np.array([c["qneg_inv"]], np.uint32).reshape(1, 1))
    prod = ma.mont_mul(ntt(jnp.asarray(am), tbd), ntt(jnp.asarray(bm), tbd),
                       qq, qneg)
    got = _unmont(intt(prod, tbd)[0], q)
    assert np.array_equal(got, np.array([int(w) for w in want], np.uint64))


def test_ntt_limb_slice():
    logN, N = 8, 256
    qs = ntt_primes_near(27.0, 2 * N, 4)
    tb = NttTables(logN, qs)
    tbd = tb.device()
    x = np.stack([RNG.integers(0, q, size=N, dtype=np.uint32) for q in qs])
    full = ntt(jnp.asarray(x), tbd)
    part = ntt(jnp.asarray(x[1:3]), tbd, limb_slice=(1, 3))
    assert np.array_equal(np.asarray(full)[1:3], np.asarray(part))
