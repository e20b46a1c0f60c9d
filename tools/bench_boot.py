"""Bootstrap-at-scale bench: full pipeline at real slot counts.

VERDICT r3 item 2: run the radix-factored bootstrap at logN 13-15
(n = 2^12..2^14 slots), measure wall seconds per ciphertext and decrypt
error, to set against the reference's ~95 s / 768 cts amortized
(BASELINE.md; reference pipeline: Bootstrapper.cpp:3231 bootstrap_full_3).

Structure: stage-level jits (modraise, each CoeffToSlot level, EvalMod,
each SlotToCoeff level) with keys AND the LT diagonal plaintexts as jit
ARGUMENTS — a collection pass (jax.eval_shape, no device compute) records
every diagonal plaintext in deterministic order, then each stage consumes
its slice of the tape.  Keeps HLO bodies small for the remote compiler
and makes stage compiles cacheable.

Prints one JSON line with boot_s_per_ct, max_err, key count, compile and
setup seconds.
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
    import jax.numpy as jnp
    from moai_tpu import mod_arith as ma
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator, KSwitchKey, GaloisKeys
    from moai_tpu.encrypt import Encryptor, Decryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ciphertext import Ciphertext, Plaintext
    from moai_tpu.boot.bootstrap import Bootstrapper
    from moai_tpu.boot.linear import apply_diagonals, _encode_pt

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

    perms = ev.galois_keys.perms
    gal_data = {g: k.data for g, k in ev.galois_keys.keys.items()}
    relin_data = ev.relin_key.data

    def set_keys(gal_, relin_):
        ev.relin_key = KSwitchKey(relin_)
        ev.galois_keys = GaloisKeys(
            {g: KSwitchKey(d) for g, d in gal_.items()}, perms)

    def restore_keys():
        set_keys(gal_data, relin_data)

    # ---- LT plaintext tape: collect once (eval_shape), replay as args ----
    class Tape:
        def __init__(self):
            self.mode = "collect"
            self.items, self.meta = [], []
            self.cursor = 0
            self.replay = {}

        def source(self, vec, scale, n_q):
            if self.mode == "collect":
                with jax.ensure_compile_time_eval():
                    pt = _encode_pt(ev, enc, vec, scale, n_q)
                self.items.append(pt.data)
                self.meta.append((float(scale), n_q))
                return pt
            i = self.cursor
            self.cursor += 1
            s_rec, nq_rec = self.meta[i]
            assert nq_rec == n_q, (i, nq_rec, n_q)
            return Plaintext(data=self.replay[i], scale=s_rec)

    tape = Tape()

    # ---- stage functions over ciphertext-LIST state ---------------------
    # (unjitted; pts via the tape source).  EvalMod is split into three
    # stages — the monolithic conj + 2x ModReducer graph was SIGKILLed by
    # the remote compiler (compile-helper OOM) at logN=13.
    delta_in = ct.scale

    def s_modraise(state):
        return [bt.modraise(state[0])]

    def mk_c2s(lev):
        def f(state):
            return [apply_diagonals(ev, enc, state[0], lev,
                                    pt_source=tape.source)]
        return f

    def s_em_split(state):
        (c,) = state
        t = ev.with_scale(c, bt.q0 * c.scale / delta_in,
                          reason="ModRaise: slots hold m*Delta/q0 + I")
        tc = ev.conjugate(t)
        qv = ev.dev["q"][:t.n_q].reshape(-1, 1)
        t_r = t.with_data(ma.add_mod(t.data, tc.data, qv))
        t_i = bt.mul_i(t.with_data(ma.sub_mod(tc.data, t.data, qv)))
        return [t_r, t_i]

    def s_em_real(state):
        t_r, t_i = state
        return [bt.mr(ev, t_r, pre_scale=0.5), t_i]

    def s_em_imag(state):
        y_r, t_i = state
        y_i = bt.mr(ev, t_i, pre_scale=0.5)
        return [ev.add(y_r, bt.mul_i(y_i))]

    def mk_s2c(lev, last):
        def f(state):
            c = state[0]
            use = lev
            if last:
                alpha = ctx.scale * bt.q0 / (2 * np.pi * delta_in * c.scale)
                use = {d: vv * alpha for d, vv in lev.items()}
            out = apply_diagonals(ev, enc, c, use, pt_source=tape.source)
            return [ev.with_scale(out, ctx.scale,
                                  reason="SlotToCoeff folded alpha")
                    if last else out]
        return f

    stages = [("modraise", s_modraise)]
    for i, lev in enumerate(bt.c2s_levels):
        stages.append((f"c2s{i}", mk_c2s(lev)))
    stages += [("em_split", s_em_split), ("em_real", s_em_real),
               ("em_imag", s_em_imag)]
    for i, lev in enumerate(bt.s2c_levels):
        stages.append((f"s2c{i}", mk_s2c(lev, i == len(bt.s2c_levels) - 1)))

    # ---- collection pass: abstract trace, records pts + stage slices ----
    bounds = []
    meta_in = []            # [(scale, n_q), ...] of each stage's input state

    def collect(d):
        state = [Ciphertext(d, delta_in, True)]
        for name, f in stages:
            bounds.append(len(tape.items))
            meta_in.append([(c.scale, c.n_q) for c in state])
            state = f(state)
        bounds.append(len(tape.items))
        return [c.data for c in state]

    restore_keys()
    jax.eval_shape(collect, jax.ShapeDtypeStruct(ct.data.shape, jnp.uint32))
    tape.mode = "replay"
    pts_all = tape.items

    # ---- per-stage jits: (state_datas, pts_slice, gal, relin) -----------
    jitted = []
    for si, (name, f) in enumerate(stages):
        lo, hi = bounds[si], bounds[si + 1]
        metas = meta_in[si]

        def run(datas, pts, gal_, relin_, f=f, metas=metas, lo=lo):
            set_keys(gal_, relin_)
            tape.cursor = lo
            tape.replay = {lo + i: p for i, p in enumerate(pts)}
            state = [Ciphertext(d, m[0], True)
                     for d, m in zip(datas, metas)]
            return [c.data for c in f(state)]

        jitted.append((name, jax.jit(run), pts_all[lo:hi]))

    def pipeline(ct_in, verbose=False):
        datas = [ct_in.data]
        for name, jf, pts in jitted:
            t0 = time.perf_counter()
            datas = jf(datas, pts, gal_data, relin_data)
            restore_keys()
            if verbose:
                datas[0].block_until_ready()
                print(f"[boot] {name:<10} {time.perf_counter()-t0:7.2f} s",
                      flush=True)
        return Ciphertext(datas[0], ctx.scale, True)

    t0 = time.perf_counter()
    outc = pipeline(ct, verbose=True)
    outc.data.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outc = pipeline(ct)
    outc.data.block_until_ready()
    run_s = time.perf_counter() - t0

    got = decryptor.decrypt(outc)
    err = float(np.max(np.abs(got.real - v)))

    print(json.dumps({
        "backend": jax.default_backend(),
        "logN": args.logN, "slots": ctx.cfg.slots,
        "lt_group": args.group, "boot_levels": bt.levels,
        "galois_keys": len(steps) + 1, "L": ctx.L,
        "lt_plaintexts": len(pts_all),
        "batch": args.batch,
        "boot_s_per_ct": round(run_s / args.batch, 3),
        "batch_s": round(run_s, 3),
        "compile_s": round(compile_s, 1),
        "setup_s": round(setup_s, 1),
        "max_err": err,
        "out_n_q": outc.n_q,
    }))


if __name__ == "__main__":
    main()
