"""Bootstrap-at-scale bench: full pipeline at real slot counts.

VERDICT r2 item 5: run the radix-factored bootstrap at logN 13-15
(n = 2^12..2^14 slots), measure wall seconds per ciphertext and decrypt
error, to set against the reference's 95 s / 768 cts amortized
(BASELINE.md; reference pipeline: Bootstrapper.cpp:3231 bootstrap_full_3).

Prints one JSON line: {"logN", "slots", "lt_group", "levels",
"boot_s_per_ct", "batch", "max_err"}.
"""

from __future__ import annotations

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

    # keys + LT plaintexts as jit ARGUMENTS (not HLO constants): ~100s of
    # MB stay on the data plane instead of the compile request
    from moai_tpu.keys import KSwitchKey, GaloisKeys
    from moai_tpu.ciphertext import Ciphertext
    lt = bt.collect_lt(ct_scale=ct.scale, n_polys=2)
    perms = ev.galois_keys.perms
    gal_data = {g: k.data for g, k in ev.galois_keys.keys.items()}
    relin_data = ev.relin_key.data

    def step(ct_data, lt_, gal_, relin_):
        ev.relin_key = KSwitchKey(relin_)
        ev.galois_keys = GaloisKeys(
            {g: KSwitchKey(d) for g, d in gal_.items()}, perms)
        return bt(Ciphertext(ct_data, ct.scale, True), lt=lt_).data

    fn = jax.jit(step)
    t0 = time.perf_counter()
    out_d = fn(ct.data, lt, gal_data, relin_data)
    out_d.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_d = fn(ct.data, lt, gal_data, relin_data)
    out_d.block_until_ready()
    run_s = time.perf_counter() - t0
    ev.relin_key = KSwitchKey(relin_data)
    ev.galois_keys = GaloisKeys(
        {g: KSwitchKey(d) for g, d in gal_data.items()}, perms)

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
