"""flagship_config() probe: construct the REAL MOAI-equivalent chain at
N = 2^16 and prove it runs on one chip.

STATUS (r4): the staged pipeline compiles and RUNS mechanically at the
--small logic-check config (all stages execute; per-stage timings print)
but decrypt error is wrong on configs with n_boot_levels > 0 (boot-pair
ladders) — the bootstrap is numerically proven only on data-pair chains
(tools/bench_boot.py: max_err 7.7e-5).  Root-causing the boot-pair
interaction is open; the N=2^16 TPU run did not fit this round.

VERDICT r3 item 4: params.flagship_config() (N=2^16, 20 data + 16 boot
levels, dnum=6 — the analog of the reference's parameter set,
test_full_scheme.hpp:345-378) had never been instantiated.  This tool
builds the context, generates keys, bootstraps ONE ciphertext through the
radix-factored pipeline, runs one CPMM column-chunk at the full chain,
and reports wall times, decrypt error, and device-memory high water.

Memory design: every switching key at this size is ~[6, 2, 86, 65536]
uint32 = 270 MB, and the bootstrap needs ~40 of them — far over 16 GB.
Keys therefore live on HOST; each stage uploads only ITS galois elements,
sliced to the stage's working level (keys.slice_kswitch), as jit
arguments, and frees them afterwards.  LT diagonal plaintexts travel the
same way (collection pass + replay tape, as in tools/bench_boot.py).

Usage: python tools/flagship_n16.py [--cpmm-cols 64] [--skip-boot]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)

import argparse
import gc
import json
import time

import numpy as np


def mem_stats():
    import jax
    try:
        s = jax.local_devices()[0].memory_stats()
        return {"bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use")}
    except Exception:
        return {}


def main():
    import jax
    import jax.numpy as jnp
    from moai_tpu import mod_arith as ma
    from moai_tpu.params import flagship_config, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import (KeyGenerator, KSwitchKey, GaloisKeys,
                               slice_kswitch)
    from moai_tpu.encrypt import Encryptor, Decryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ciphertext import Ciphertext, Plaintext
    from moai_tpu.boot.bootstrap import Bootstrapper
    from moai_tpu.boot.linear import apply_diagonals, _encode_pt, bsgs_steps
    from moai_tpu.modmat import (host_weight_digits, host_bucket_consts,
                                 mod_matmul)

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpmm-cols", type=int, default=64,
                    help="input/output columns for the full-chain CPMM "
                         "chunk (768 columns = 12 such chunks per axis)")
    ap.add_argument("--group", type=int, default=3)
    ap.add_argument("--skip-boot", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="logN=11 logic-check config (CPU-friendly)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    res = {"tool": "flagship_n16"}
    t00 = time.perf_counter()
    if args.small:
        from moai_tpu.params import CKKSConfig
        cfg = CKKSConfig(logN=11, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                         n_data_levels=6, boot_pair_bits=29.0,
                         n_boot_levels=13, dnum=3, hamming_weight=64)
    else:
        cfg = flagship_config()
    t0 = time.perf_counter()
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    res["context_s"] = round(time.perf_counter() - t0, 1)
    res["N"] = cfg.N
    res["L"] = ctx.L
    res["K"] = ctx.K
    res["logQP_bits"] = round(sum(np.log2(float(p))
                                  for p in ctx.all_primes), 1)
    print(f"[n16] context: L={ctx.L} K={ctx.K} "
          f"logQP={res['logQP_bits']} ({res['context_s']} s)", flush=True)

    ev = Evaluator(ctx)
    bt = Bootstrapper(ev, enc, lt_group=args.group)
    res["boot_levels"] = bt.levels
    assert bt.levels <= (ctx.L - ctx.n_q0) // 2 - 1, (bt.levels, ctx.L)

    # per-stage galois element sets
    n = enc.slots
    two_n = 2 * cfg.N

    def elts_for(lev):
        return [pow(5, s % n, two_n)
                for s in bsgs_steps(sorted(lev.keys()), n)]

    conj = 2 * cfg.N - 1
    stage_elts = [[]]                                  # modraise
    for lev in bt.c2s_levels:
        stage_elts.append(elts_for(lev))
    stage_elts.append([conj])                          # evalmod
    for lev in bt.s2c_levels:
        stage_elts.append(elts_for(lev))
    all_elts = sorted({e for es in stage_elts for e in es})

    # ---- keygen: straight to host -----------------------------------
    t0 = time.perf_counter()
    kg = KeyGenerator(ctx, seed=99)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    host_relin = np.asarray(kg.gen_relin_key().data)
    host_gal, perms = {}, {}
    for e in all_elts:
        step = None                 # generate by element directly
        perm = kg.galois_perm(e)
        s_g = jnp.take(kg.sk.s_ntt, jnp.asarray(perm), axis=-1)
        host_gal[e] = np.asarray(kg._gen_kswitch(s_g).data)
        perms[e] = perm
        print(f"[n16] galois key {e} ({len(host_gal)}/{len(all_elts)})",
              flush=True)
    res["keygen_s"] = round(time.perf_counter() - t0, 1)
    res["galois_keys"] = len(host_gal)
    res["key_bytes_each"] = int(host_relin.nbytes)
    print(f"[n16] keygen {res['keygen_s']} s, "
          f"{len(host_gal)} galois keys x {host_relin.nbytes/2**20:.0f} MB",
          flush=True)
    del kg
    gc.collect()

    rng = np.random.default_rng(5)

    if not args.skip_boot:
        # ---- staged bootstrap of ONE ciphertext ----------------------
        v = rng.uniform(-0.8, 0.8, ctx.cfg.slots)
        ct = encryptor.encrypt(encryptor.encode(v, n_q=ctx.n_q0))
        delta_in = ct.scale

        class Tape:
            mode = "collect"
            items, meta = [], []
            cursor = 0
            replay = {}

            def source(self, vec, scale, n_q):
                if self.mode == "collect":
                    with jax.ensure_compile_time_eval():
                        pt = _encode_pt(ev, enc, vec, scale, n_q)
                    self.items.append(np.asarray(pt.data))   # host
                    self.meta.append((float(scale), n_q))
                    return pt
                i = self.cursor
                self.cursor += 1
                s_rec, nq_rec = self.meta[i]
                assert nq_rec == n_q, (i, nq_rec, n_q)
                return Plaintext(data=self.replay[i], scale=s_rec)

        tape = Tape()

        def s_modraise(c):
            return bt.modraise(c)

        def mk_c2s(lev):
            return lambda c: apply_diagonals(ev, enc, c, lev,
                                             pt_source=tape.source)

        def s_evalmod(c):
            t = ev.with_scale(c, bt.q0 * c.scale / delta_in,
                              reason="ModRaise: slots hold m*D/q0 + I")
            tc = ev.conjugate(t)
            qv = ev.dev["q"][:t.n_q].reshape(-1, 1)
            t_r = t.with_data(ma.add_mod(t.data, tc.data, qv))
            t_i = bt.mul_i(t.with_data(ma.sub_mod(tc.data, t.data, qv)))
            y_r = bt.mr(ev, t_r, pre_scale=0.5)
            y_i = bt.mr(ev, t_i, pre_scale=0.5)
            return ev.add(y_r, bt.mul_i(y_i))

        def mk_s2c(lev, last):
            def f(c):
                use = lev
                if last:
                    alpha = ctx.scale * bt.q0 / (2 * np.pi * delta_in
                                                 * c.scale)
                    use = {d: vv * alpha for d, vv in lev.items()}
                out = apply_diagonals(ev, enc, c, use,
                                      pt_source=tape.source)
                return ev.with_scale(out, ctx.scale,
                                     reason="S2C folded alpha") \
                    if last else out
            return f

        stages = [("modraise", s_modraise)]
        for i, lev in enumerate(bt.c2s_levels):
            stages.append((f"c2s{i}", mk_c2s(lev)))
        stages.append(("evalmod", s_evalmod))
        for i, lev in enumerate(bt.s2c_levels):
            stages.append((f"s2c{i}",
                           mk_s2c(lev, i == len(bt.s2c_levels) - 1)))

        bounds, meta_in = [], []

        def collect(d):
            c = Ciphertext(d, delta_in, True)
            for _, f in stages:
                bounds.append(len(tape.items))
                meta_in.append((c.scale, c.n_q))
                c = f(c)
            bounds.append(len(tape.items))
            return c.data

        # collection needs keys bound (rotate asserts key presence)
        ev.relin_key = KSwitchKey(jnp.asarray(host_relin))  # placeholder
        ev.galois_keys = GaloisKeys(
            {e: ev.relin_key for e in all_elts + [conj]}, perms)
        t0 = time.perf_counter()
        jax.eval_shape(collect,
                       jax.ShapeDtypeStruct(ct.data.shape, jnp.uint32))
        tape.mode = "replay"
        res["lt_collect_s"] = round(time.perf_counter() - t0, 1)
        res["lt_plaintexts"] = len(tape.items)
        ev.relin_key = None
        ev.galois_keys = None
        print(f"[n16] LT collection: {len(tape.items)} plaintexts "
              f"({res['lt_collect_s']} s)", flush=True)

        stage_rows = []
        d = ct.data
        for si, (name, f) in enumerate(stages):
            lo, hi = bounds[si], bounds[si + 1]
            sc_in, nq_in = meta_in[si]
            elts = stage_elts[si]
            # upload this stage's keys, sliced to its level
            t_up = time.perf_counter()
            need_relin = name == "evalmod"
            ks = {}
            if need_relin:
                ks["relin"] = slice_kswitch(
                    KSwitchKey(jnp.asarray(host_relin)), nq_in, ctx.L).data
            ks["gal"] = {
                e: slice_kswitch(KSwitchKey(jnp.asarray(host_gal[e])),
                                 nq_in, ctx.L).data for e in elts}
            pts = [jnp.asarray(tape.items[i]) for i in range(lo, hi)]
            up_s = time.perf_counter() - t_up

            def run(dd, pts_, ks_, f=f, sc_in=sc_in, lo=lo):
                ev.relin_key = KSwitchKey(
                    ks_["relin"], q_limbs=ks_["relin"].shape[-2] - ctx.K) \
                    if "relin" in ks_ else None
                ev.galois_keys = GaloisKeys(
                    {e: KSwitchKey(kd, q_limbs=kd.shape[-2] - ctx.K)
                     for e, kd in ks_["gal"].items()}, perms)
                tape.cursor = lo
                tape.replay = {lo + i: p for i, p in enumerate(pts_)}
                return f(Ciphertext(dd, sc_in, True)).data

            jf = jax.jit(run)
            t0 = time.perf_counter()
            d2 = jf(d, pts, ks)
            d2.block_until_ready()
            compile_run_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            d2 = jf(d, pts, ks)
            d2.block_until_ready()
            run_s = time.perf_counter() - t0
            d = d2
            ev.relin_key = None
            ev.galois_keys = None
            ev._perm_cache.clear()
            del ks, pts
            gc.collect()
            row = {"stage": name, "upload_s": round(up_s, 2),
                   "compile_run_s": round(compile_run_s, 2),
                   "run_s": round(run_s, 3), **mem_stats()}
            stage_rows.append(row)
            print(f"[n16] {name:<10} up {up_s:6.1f}s "
                  f"compile+run {compile_run_s:7.1f}s run {run_s:7.2f}s",
                  flush=True)

        outc = Ciphertext(d, ctx.scale, True)
        got = decryptor.decrypt(outc)
        res["boot_stages"] = stage_rows
        res["boot_run_s"] = round(sum(r["run_s"] for r in stage_rows), 2)
        res["boot_max_err"] = float(np.max(np.abs(got.real - v)))
        res["boot_out_n_q"] = outc.n_q
        print(f"[n16] bootstrap: run {res['boot_run_s']} s, "
              f"err {res['boot_max_err']:.2e}, out n_q {outc.n_q}",
              flush=True)

    # ---- one CPMM chunk at the FULL chain ---------------------------
    C = args.cpmm_cols
    xs = rng.normal(0, 0.3, (C, ctx.cfg.slots))
    x_ct = encryptor.encrypt(encryptor.encode(xs, n_q=ctx.L))
    W = rng.normal(0, 0.05, (C, C))
    w_sc = float(ctx.q_primes[ctx.L - 1]) * float(ctx.q_primes[ctx.L - 2])
    wi64 = np.round(W * w_sc).astype(np.int64)
    resid = np.empty((ctx.L, C, C), np.uint32)
    for li, qq in enumerate(ctx.q_primes):
        resid[li] = (wi64 % qq).astype(np.uint32)
    wd = jnp.asarray(host_weight_digits(resid))
    bm, bo = host_bucket_consts(ctx.q_primes[:ctx.L])
    bm, bo = jnp.asarray(bm), jnp.asarray(bo)

    def f_cpmm(xd, wdig):
        out = mod_matmul(xd, wdig, bm, bo, ev.dev["q"][:ctx.L],
                         ev.dev["qneg_inv"][:ctx.L])
        return ev.rescale_pair(Ciphertext(out, x_ct.scale * w_sc,
                                          True)).data

    jf = jax.jit(f_cpmm)
    t0 = time.perf_counter()
    out = jf(x_ct.data, wd)
    out.block_until_ready()
    res["cpmm_compile_run_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    out = jf(x_ct.data, wd)
    out.block_until_ready()
    res["cpmm_run_s"] = round(time.perf_counter() - t0, 3)
    got = decryptor.decrypt(
        Ciphertext(out, x_ct.scale, True))
    want = (np.moveaxis(xs.reshape(C, -1), 0, -1) @ W).T
    res["cpmm_cols"] = C
    res["cpmm_max_err"] = float(np.max(np.abs(got.real - want)))
    res["mem"] = mem_stats()
    res["total_s"] = round(time.perf_counter() - t00, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
