"""NTT microbenchmark: jnp 4-step vs Pallas MXU kernel on the current
backend (the reference's analog: native/bench/ntt.cpp)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)


import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from moai_tpu.ntt import NttTables, ntt, intt
    from moai_tpu.primes import ntt_primes_near

    logN = 15
    N = 1 << logN
    BATCH, L = 32, 18
    qs = ntt_primes_near(26.0, 2 * N, L)
    nt = NttTables(logN, qs)
    tb = nt.device()                       # jnp-only tables
    from moai_tpu.pallas_ntt import PallasNttTables, ntt_pallas, intt_pallas
    tbp = PallasNttTables(nt).device()

    rng = np.random.default_rng(0)
    x = np.empty((BATCH, L, N), np.uint32)
    for i, q in enumerate(qs):
        x[:, i, :] = rng.integers(0, q, size=(BATCH, N))
    xj = jnp.asarray(x)

    jnp_fwd = jax.jit(lambda v: ntt(v, tb))
    pal_fwd = jax.jit(lambda v: ntt_pallas(v, tbp))
    pal_inv = jax.jit(lambda v: intt_pallas(v, tbp))

    r_j = jnp_fwd(xj); r_j.block_until_ready()
    r_p = pal_fwd(xj); r_p.block_until_ready()
    match = bool(np.array_equal(np.asarray(r_j), np.asarray(r_p)))
    r_i = pal_inv(r_p); r_i.block_until_ready()
    roundtrip = bool(np.array_equal(np.asarray(r_i), x))

    def t(fn, v, reps=10):
        fn(v).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(v)
        out.block_until_ready()
        return (time.perf_counter() - t0) / reps

    tj = t(jnp_fwd, xj)
    tp = t(pal_fwd, xj)
    n_tr = BATCH * L
    print(json.dumps({
        "backend": jax.default_backend(),
        "N": N, "batch": BATCH, "limbs": L,
        "match": match, "roundtrip": roundtrip,
        "jnp_ms": round(tj * 1e3, 3),
        "pallas_ms": round(tp * 1e3, 3),
        "speedup": round(tj / tp, 2),
        "pallas_us_per_limb_transform": round(tp / n_tr * 1e6, 2),
    }))


if __name__ == "__main__":
    main()
