"""Per-op timing breakdown of the bench composite on the current backend.

Times each evaluator stage (multiply, relinearize, rescale_pair, rotate)
and the raw NTT/INTT primitives at bench shapes, so optimization targets
the measured hot spot (the reference's analog: per-stage gettimeofday
prints, single_att_block.hpp:93-95).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)


import json
import time

import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jtree_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jtree_block(out)
    return (time.perf_counter() - t0) / reps


def jtree_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import jax
    from moai_tpu.params import bench_config_n15, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator
    from moai_tpu.encrypt import Encryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ciphertext import Ciphertext
    from moai_tpu.ntt import ntt, intt

    BATCH = 32
    ctx = make_context(bench_config_n15())
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=3)
    gks = kg.gen_galois_keys(steps=[1])
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)

    rng = np.random.default_rng(0)
    vals = rng.uniform(-1, 1, (BATCH, ctx.cfg.slots))
    a = encryptor.encrypt(encryptor.encode(vals))
    b = encryptor.encrypt(encryptor.encode(vals[::-1]))

    scale = ctx.scale
    n_q = ctx.L

    def mk(fn):
        return jax.jit(fn)

    mul = mk(lambda ad, bd: ev.multiply(Ciphertext(ad, scale, True),
                                        Ciphertext(bd, scale, True)).data)
    c3 = mul(a.data, b.data)
    relin = mk(lambda d: ev.relinearize(
        Ciphertext(d, scale * scale, True)).data)
    c2 = relin(c3)
    resc = mk(lambda d: ev.rescale_pair(
        Ciphertext(d, scale * scale, True)).data)
    c1 = resc(c2)
    rot = mk(lambda d: ev.rotate(Ciphertext(d, scale, True), 1).data)
    _ = rot(c1)
    fwd = mk(lambda d: ntt(d, ev.tbd, limb_slice=(0, n_q)))
    inv = mk(lambda d: intt(d, ev.tbd, limb_slice=(0, n_q)))
    poly = a.data[:, 0]                       # [BATCH, L, N]
    deco = mk(lambda d: ev._ks_decompose(d, n_q))
    y = deco(poly)
    keyrows = ev._key_rows(ev.relin_key.data, n_q)
    mac = mk(lambda yy: ev._ks_mac_moddown(yy, keyrows, n_q))

    res = {
        "multiply_ms": timeit(mul, a.data, b.data) * 1e3,
        "relinearize_ms": timeit(relin, c3) * 1e3,
        "rescale_pair_ms": timeit(resc, c2) * 1e3,
        "rotate_ms": timeit(rot, c1) * 1e3,
        "ntt_Llimbs_ms": timeit(fwd, poly) * 1e3,
        "intt_Llimbs_ms": timeit(inv, poly) * 1e3,
        "ks_decompose_ms": timeit(deco, poly) * 1e3,
        "ks_mac_moddown_ms": timeit(mac, y) * 1e3,
    }
    res = {k: round(v, 2) for k, v in res.items()}
    res["batch"] = BATCH
    res["L"] = n_q
    res["K"] = ctx.K
    res["dnum"] = ctx.dnum
    res["backend"] = jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
