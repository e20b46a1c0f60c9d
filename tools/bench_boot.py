"""Bootstrap-at-scale bench: full pipeline at real slot counts.

VERDICT r2 item 5: run the radix-factored bootstrap at logN 13-15
(n = 2^12..2^14 slots), measure wall seconds per ciphertext and decrypt
error, to set against the reference's 95 s / 768 cts amortized
(BASELINE.md; reference pipeline: Bootstrapper.cpp:3231 bootstrap_full_3).

Prints one JSON line: {"logN", "slots", "lt_group", "levels",
"boot_s_per_ct", "batch", "max_err"}.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)


import argparse
import json
import time

import numpy as np


def main():
    import jax
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator
    from moai_tpu.encrypt import Encryptor, Decryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.boot.bootstrap import Bootstrapper

    ap = argparse.ArgumentParser()
    ap.add_argument("--logN", type=int, default=13)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--group", type=int, default=3)
    ap.add_argument("--levels", type=int, default=None,
                    help="n_data_levels (default: boot depth + 4)")
    ap.add_argument("--dnum", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # depth: c2s + evalmod(1+7+1+2) + s2c with lt_group levels each side
    logn = args.logN - 1
    lt_levels = -(-logn // args.group)
    boot_depth = 2 * lt_levels + 11
    n_data = args.levels if args.levels else boot_depth + 4
    cfg = CKKSConfig(logN=args.logN, q0_bits=(30.0, 30.0),
                     data_pair_bits=26.0, n_data_levels=n_data,
                     n_boot_levels=0, dnum=args.dnum,
                     special_bits=29.5, hamming_weight=192)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    t0 = time.perf_counter()
    kg = KeyGenerator(ctx, seed=55)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc, lt_group=args.group)
    assert bt.levels <= (ctx.L - ctx.n_q0) // 2 - 1, \
        (bt.levels, ctx.L)
    steps = bt.galois_steps()
    ev.galois_keys = kg.gen_galois_keys(steps=steps, conjugate=True)
    setup_s = time.perf_counter() - t0

    rng = np.random.default_rng(1)
    v = rng.uniform(-0.8, 0.8, (args.batch, ctx.cfg.slots))
    ct = encryptor.encrypt(encryptor.encode(v, n_q=ctx.n_q0))

    # Stage-level jits with keys as ARGUMENTS: the whole-pipeline graph
    # overwhelms remote compilers (and keys/plaintexts must stay out of
    # the HLO body); each stage compiles small and the chain reproduces
    # Bootstrapper._run exactly (same scale/level bookkeeping).
    import numpy as _np
    from moai_tpu import mod_arith as ma
    from moai_tpu.keys import KSwitchKey, GaloisKeys
    from moai_tpu.ciphertext import Ciphertext
    from moai_tpu.boot.linear import apply_diagonals
    perms = ev.galois_keys.perms
    gal_data = {g: k.data for g, k in ev.galois_keys.keys.items()}
    relin_data = ev.relin_key.data

    def set_keys(gal_, relin_):
        ev.relin_key = KSwitchKey(relin_)
        ev.galois_keys = GaloisKeys(
            {g: KSwitchKey(d) for g, d in gal_.items()}, perms)

    def restore_keys():
        set_keys(gal_data, relin_data)

    def mk(f):
        jf = jax.jit(f)

        def call(c):
            out = jf(c, gal_data, relin_data)
            restore_keys()
            return out
        return call

    j_modraise = mk(lambda c, g, r: (set_keys(g, r), bt.modraise(c))[1])
    j_c2s = [mk(lambda c, g, r, lev=lev:
                (set_keys(g, r), apply_diagonals(ev, enc, c, lev))[1])
             for lev in bt.c2s_levels]

    def f_split_mod(c, g, r):
        set_keys(g, r)
        tc = ev.conjugate(c)
        qv = ev.dev["q"][:c.n_q].reshape(-1, 1)
        t_r = c.with_data(ma.add_mod(c.data, tc.data, qv))
        t_i = bt.mul_i(c.with_data(ma.sub_mod(tc.data, c.data, qv)))
        y_r = bt.mr(ev, t_r, pre_scale=0.5)
        y_i = bt.mr(ev, t_i, pre_scale=0.5)
        return ev.add(y_r, bt.mul_i(y_i))

    j_evalmod = mk(f_split_mod)

    def mk_s2c(lev, alpha_fold):
        def f(c, g, r):
            set_keys(g, r)
            use = {d: v * alpha_fold for d, v in lev.items()} \
                if alpha_fold is not None else lev
            return apply_diagonals(ev, enc, c, use)
        return mk(f)

    def pipeline(ct_in):
        delta_in = ct_in.scale
        z = j_modraise(ct_in)
        for j in j_c2s:
            z = j(z)
        t = ev.with_scale(z, bt.q0 * z.scale / delta_in,
                          reason="ModRaise: slots hold m*Delta/q0 + I")
        w = j_evalmod(t)
        alpha = ctx.scale * bt.q0 / (2 * _np.pi * delta_in * w.scale)
        outc = w
        for i, jf in enumerate(j_s2c_build(alpha)):
            outc = jf(outc)
        return ev.with_scale(outc, ctx.scale,
                             reason="SlotToCoeff folded alpha into last LT")

    _s2c_cache = {}

    def j_s2c_build(alpha):
        key = round(float(alpha), 12)
        if key not in _s2c_cache:
            _s2c_cache[key] = [
                mk_s2c(lev, alpha if i == len(bt.s2c_levels) - 1 else None)
                for i, lev in enumerate(bt.s2c_levels)]
        return _s2c_cache[key]

    t0 = time.perf_counter()
    outc = pipeline(ct)
    outc.data.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outc = pipeline(ct)
    outc.data.block_until_ready()
    run_s = time.perf_counter() - t0
    out_d = outc.data

    out = type(ct)(out_d, ctx.scale, True)
    got = decryptor.decrypt(out)
    err = float(np.max(np.abs(got.real - v)))

    print(json.dumps({
        "backend": jax.default_backend(),
        "logN": args.logN, "slots": ctx.cfg.slots,
        "lt_group": args.group, "boot_levels": bt.levels,
        "galois_keys": len(steps) + 1, "L": ctx.L,
        "batch": args.batch,
        "boot_s_per_ct": round(run_s / args.batch, 3),
        "batch_s": round(run_s, 3),
        "compile_s": round(compile_s, 1),
        "setup_s": round(setup_s, 1),
        "max_err": err,
        "out_n_q": out.n_q,
    }))


if __name__ == "__main__":
    main()
