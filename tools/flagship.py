"""Flagship stage bench: every stage of one encrypted BERT layer at real
dimensions, each timed at the level the reference runs it — the direct
analog of paper Table 3 (reference: test_full_scheme.hpp:484-1120 with
per-stage prints :528-555; Table 3 levels: QKV 15->14, QKT 14->13,
softmax 13->3, AV 3->2, W_O 2->1, LN 21->1, FFN 10->9, GELU 9->2,
W_F 2->1).

Stages are independent jitted calls on synthetic ciphertexts encrypted at
the stage's entry level (one compile each, the per-head fn reused across
heads, FFN chunk fn reused across chunks), so the full-768-column layer
fits one chip's HBM even though an end-to-end no-bootstrap chain would
not — exactly like the real bootstrapped execution, where no ciphertext
ever exceeds the post-bootstrap level.  The one reference stage not
covered here is bootstrapping itself (tools/bench_boot.py).

Per-input amortization: stage seconds / num_x interleaved inputs
(reference convention, README.md:29-31).

Usage: python tools/flagship.py --preset {smoke,n15} [--stages a,b,...]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# reference Table 3 per-layer-per-input seconds (12-layer totals / 12),
# for vs_baseline ratios (BASELINE.md)
REF_PER_LAYER_S = {
    "qkv_cpmm": 37.4 / 12,
    "qkt_ccmm": 40.3 / 12,
    "softmax": 53.3 / 12,
    "av_ccmm": 1.4 / 12,
    "self_output_cpmm": 1.7 / 12,
    "layernorm_x2": 1.2 / 12,
    "ffn_gelu_ffn": (44.1 + 3.3 + 7.1) / 12,
}
REF_NOBOOT_PER_LAYER_S = sum(REF_PER_LAYER_S.values())   # ~15.8 s/input

PRESETS = {
    "smoke": dict(logN=11, num_x=128, num_row=8, d_model=32, num_heads=2,
                  head_dim=16, d_inter=64, exp_r=4, inv_iters=4,
                  ln_newton=2, ln_gold=1, ffn_chunk=64, dnum=2,
                  reps=1),
    "n15": dict(logN=15, num_x=128, num_row=128, d_model=768, num_heads=12,
                head_dim=64, d_inter=3072, exp_r=7, inv_iters=16,
                ln_newton=3, ln_gold=1, ffn_chunk=512, dnum=3,
                reps=1),
}


def run(preset: str, verbose: bool = True, only=None) -> dict:
    import jax
    import jax.numpy as jnp
    from moai_tpu import mod_arith as ma
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator
    from moai_tpu.encrypt import Encryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ciphertext import Ciphertext
    from moai_tpu.ops.packing import bias_vec
    from moai_tpu.ops.matmul import (CPMM, ccmm_col_to_diag,
                                     ccmm_diag_to_col, ccmm_col_steps,
                                     ccmm_diag_steps)
    from moai_tpu.ops.nonlinear import (softmax_diag, layernorm, gelu,
                                        diag_valid_masks,
                                        inverse_goldschmidt)
    from moai_tpu.modmat import (host_weight_digits, host_bucket_consts,
                                 mod_matmul)
    from moai_tpu.models.bert import BertDims
    from moai_tpu.utils.debug import StageTimer

    p = PRESETS[preset]
    dims = BertDims(num_x=p["num_x"], num_row=p["num_row"],
                    d_model=p["d_model"], num_heads=p["num_heads"],
                    head_dim=p["head_dim"], d_inter=p["d_inter"])
    # max level any stage needs: LN entry (6 + 3*newton + 2*gold + 1)
    ln_depth = 6 + 3 * p["ln_newton"] + 2 * p["ln_gold"]
    inv_depth = p["inv_iters"] + 1
    n_levels = max(16, ln_depth + 2, inv_depth + 3)
    cfg = CKKSConfig(logN=p["logN"], q0_bits=(30.0, 30.0),
                     data_pair_bits=26.0, n_data_levels=n_levels,
                     n_boot_levels=0, dnum=p["dnum"], hamming_weight=192)
    ctx = make_context(cfg)
    assert dims.num_x * dims.num_row == ctx.cfg.slots
    enc = Encoder(ctx)
    t0 = time.perf_counter()
    kg = KeyGenerator(ctx, seed=11)
    steps = sorted(set(ccmm_col_steps(dims.num_x, dims.num_row)
                       + ccmm_diag_steps(dims.num_x, dims.num_row)))
    gks = kg.gen_galois_keys(steps=steps)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)
    setup_s = time.perf_counter() - t0

    rng = np.random.default_rng(3)
    lens = np.full(min(8, dims.num_x), dims.num_row)
    mask = bias_vec(lens, dims.num_x, dims.num_row, ctx.cfg.slots)
    masks = diag_valid_masks(lens, dims.num_x, dims.num_row, ctx.cfg.slots)
    scale = ctx.scale
    q0 = ctx.n_q0
    hd, H = dims.head_dim, dims.num_heads

    def lv(k):     # composite level k above q0 -> prime count
        return min(ctx.L, q0 + 2 * k)

    def enc_at(ncols, n_q, mag=0.3):
        vals = rng.normal(0, mag, (ncols, ctx.cfg.slots))
        return encryptor.encrypt(encryptor.encode(vals, n_q=n_q))

    timer = StageTimer(verbose=verbose)
    results = {}

    def stage(name, build, inputs, reps=p["reps"]):
        if only and name not in only:
            return
        fn = jax.jit(build)
        out = fn(*inputs)                       # compile
        jax.tree_util.tree_map(
            lambda l: l.block_until_ready() if hasattr(
                l, "block_until_ready") else None, out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*inputs)
        jax.tree_util.tree_map(
            lambda l: l.block_until_ready() if hasattr(
                l, "block_until_ready") else None, out)
        dt = (time.perf_counter() - t0) / reps
        results[name] = dt
        if verbose:
            print(f"[moai] {name:<24} {dt:8.3f} s")
        return out

    W = lambda *s: rng.normal(0, 0.05, s)

    # ---- QKV CPMM (reference level 15->14; V computed at 4->3) ----------
    # biases via per-column residues (add_const_vec); weight digit planes
    # travel as jit arguments (CPMM.params)
    n_att = lv(15)
    x = enc_at(dims.d_model, n_att)
    q_mm = CPMM(ev, enc, W(dims.d_model, H * hd) / np.sqrt(hd), n_att,
                mask=mask)
    k_mm = CPMM(ev, enc, W(dims.d_model, H * hd), n_att, mask=mask)
    v_mm = CPMM(ev, enc, W(dims.d_model, H * hd), lv(4), mask=mask)
    bq, bk, bv = W(H * hd), W(H * hd), W(H * hd)

    def f_qkv(xd, qp, kp, vp):
        xc = Ciphertext(xd, scale, True)
        return (ev.add_const_vec(q_mm(xc, params=qp), bq).data,
                ev.add_const_vec(k_mm(xc, params=kp), bk).data,
                ev.add_const_vec(v_mm(ev.mod_drop_to(xc, lv(4)),
                                      params=vp), bv).data)

    stage("qkv_cpmm", f_qkv,
          (x.data, q_mm.params(), k_mm.params(), v_mm.params()))
    del x

    # ---- QK^T CCMM per head (14->13), all heads sequential --------------
    n_qk = lv(14)
    qh = enc_at(hd, n_qk)
    kh = enc_at(hd, n_qk)

    def f_qkt(qd, kd):
        return ccmm_col_to_diag(ev, Ciphertext(qd, scale, True),
                                Ciphertext(kd, scale, True),
                                dims.num_x, dims.num_row).data

    if only is None or "qkt_ccmm" in only:
        fn = jax.jit(f_qkt)
        out = fn(qh.data, kh.data)
        out.block_until_ready()
        t1 = time.perf_counter()
        for _ in range(H):
            out = fn(qh.data, kh.data)
        out.block_until_ready()
        results["qkt_ccmm"] = time.perf_counter() - t1
        if verbose:
            print(f"[moai] {'qkt_ccmm':<24} {results['qkt_ccmm']:8.3f} s "
                  f"({H} heads)")

    # ---- softmax (13 -> refresh slot -> out), all heads ----------------
    # part 1: exp + mask + sum (13 -> ...); part 2: inverse + final mult
    # at the post-bootstrap level (the reference bootstraps the sum ct)
    n_sm = lv(13)
    sm_in = enc_at(dims.num_row, n_sm)

    def f_sm_exp(sd):
        ct = Ciphertext(sd, scale, True)
        return softmax_diag(ev, enc, ct, masks, max_val=4.0,
                            refresh=lambda c: c,
                            inv_iters=0, exp_r=p["exp_r"]).data

    if only is None or "softmax" in only:
        fn = jax.jit(f_sm_exp)
        out = fn(sm_in.data)
        out.block_until_ready()
        t1 = time.perf_counter()
        for _ in range(H):
            out = fn(sm_in.data)
        out.block_until_ready()
        part1 = time.perf_counter() - t1
        # part 2: Goldschmidt inverse of the bootstrapped sum + e*inv
        n_inv = lv(inv_depth + 2)
        s_ct = enc_at(1, n_inv, mag=0.2)
        e_ct = enc_at(dims.num_row, n_inv)

        def f_sm_inv(sd, ed):
            s = Ciphertext(sd[0], scale, True)
            s = ev.add_const(s, 0.7)           # keep 1/x domain sane
            inv = inverse_goldschmidt(ev, s, p["inv_iters"])
            e = Ciphertext(ed, scale, True)
            en, invn = ev.align(e, inv)
            return ev.mul_relin_rescale(
                en, invn.with_data(jnp.broadcast_to(
                    invn.data[None], en.data.shape))).data

        fn2 = jax.jit(f_sm_inv)
        out2 = fn2(s_ct.data, e_ct.data)
        out2.block_until_ready()
        t1 = time.perf_counter()
        for _ in range(H):
            out2 = fn2(s_ct.data, e_ct.data)
        out2.block_until_ready()
        part2 = time.perf_counter() - t1
        results["softmax"] = part1 + part2
        if verbose:
            print(f"[moai] {'softmax':<24} {part1 + part2:8.3f} s "
                  f"(exp/sum {part1:.3f} + inv/mult {part2:.3f}, {H} heads)")

    # ---- softmax*V diag->col CCMM (3->2), all heads ---------------------
    n_av = lv(3)
    av_a = enc_at(dims.num_row, n_av)
    av_v = enc_at(hd, n_av)

    def f_av(ad, vd):
        return ccmm_diag_to_col(ev, Ciphertext(ad, scale, True),
                                Ciphertext(vd, scale, True),
                                dims.num_x, dims.num_row).data

    if only is None or "av_ccmm" in only:
        fn = jax.jit(f_av)
        out = fn(av_a.data, av_v.data)
        out.block_until_ready()
        t1 = time.perf_counter()
        for _ in range(H):
            out = fn(av_a.data, av_v.data)
        out.block_until_ready()
        results["av_ccmm"] = time.perf_counter() - t1
        if verbose:
            print(f"[moai] {'av_ccmm':<24} {results['av_ccmm']:8.3f} s "
                  f"({H} heads)")

    # ---- self-output CPMM (2->1) ---------------------------------------
    att = enc_at(dims.d_model, lv(2))
    o_mm = CPMM(ev, enc, W(dims.d_model, dims.d_model), lv(2), mask=mask)
    bo = W(dims.d_model)
    stage("self_output_cpmm",
          lambda d, op: ev.add_const_vec(
              o_mm(Ciphertext(d, scale, True), params=op), bo).data,
          (att.data, o_mm.params()))
    del att

    # ---- LayerNorm x2 (reference 21->1 each) ---------------------------
    n_ln = lv(ln_depth + 1)
    h_ln = enc_at(dims.d_model, n_ln)
    g_v, b_v = rng.uniform(0.8, 1.2, dims.d_model), W(dims.d_model)

    def f_ln(hdata):
        ct = Ciphertext(hdata, scale, True)
        return layernorm(ev, ct, g_v, b_v,
                         var_domain=(0.05 * dims.d_model ** 2,
                                     2.0 * dims.d_model ** 2),
                         newton_iters=p["ln_newton"],
                         gold_iters=p["ln_gold"]).data

    if only is None or "layernorm_x2" in only:
        fn = jax.jit(f_ln)
        out = fn(h_ln.data)
        out.block_until_ready()
        t1 = time.perf_counter()
        out = fn(h_ln.data)
        out2 = fn(h_ln.data)
        out2.block_until_ready()
        results["layernorm_x2"] = time.perf_counter() - t1
        if verbose:
            print(f"[moai] {'layernorm_x2':<24} "
                  f"{results['layernorm_x2']:8.3f} s")
    del h_ln

    # ---- FFN: W_I CPMM (10->9) + GELU (9->2) + W_F CPMM (2->1) ---------
    gelu_deg = 24
    gelu_depth = 2 + max(1, (gelu_deg - 1).bit_length())
    n_ffn = lv(10)
    n_gelu_out = n_ffn - 2 - 2 * gelu_depth     # CPMM rescale + gelu
    ffn_chunk = p["ffn_chunk"]

    def enc_digits(Wm, n_q, w_scale):
        qs = ctx.q_primes[:n_q]
        res = np.empty((n_q,) + Wm.shape, dtype=np.uint32)
        wi64 = np.round(np.asarray(Wm, np.float64) * w_scale
                        ).astype(np.int64)
        for li, qq in enumerate(qs):
            res[li] = (wi64 % qq).astype(np.uint32)
        return jnp.asarray(host_weight_digits(res))

    wi_scale = float(ctx.q_primes[n_ffn - 1]) * \
        float(ctx.q_primes[n_ffn - 2])
    wf_scale = float(ctx.q_primes[n_gelu_out - 1]) * \
        float(ctx.q_primes[n_gelu_out - 2])
    wi_digs = [enc_digits(W(dims.d_model, ffn_chunk), n_ffn, wi_scale)
               for _ in range(dims.d_inter // ffn_chunk)]
    wf_digs = [enc_digits(W(ffn_chunk, dims.d_model), n_gelu_out, wf_scale)
               for _ in range(dims.d_inter // ffn_chunk)]
    bm_i, bo_i = host_bucket_consts(ctx.q_primes[:n_ffn])
    bm_f, bo_f = host_bucket_consts(ctx.q_primes[:n_gelu_out])
    bm_i, bo_i = jnp.asarray(bm_i), jnp.asarray(bo_i)
    bm_f, bo_f = jnp.asarray(bm_f), jnp.asarray(bo_f)
    h_ffn = enc_at(dims.d_model, n_ffn)

    def f_ffn_chunk(hdata, wi_dig, wf_dig):
        h = Ciphertext(hdata, scale, True)
        f0 = mod_matmul(h.data, wi_dig, bm_i, bo_i,
                        ev.dev["q"][:n_ffn], ev.dev["qneg_inv"][:n_ffn])
        f = ev.rescale_pair(Ciphertext(f0, scale * wi_scale, True))
        f = gelu(ev, f, domain=16.0, degree=gelu_deg)
        f = ev.mod_drop_to(f, n_gelu_out)
        return mod_matmul(f.data, wf_dig, bm_f, bo_f,
                          ev.dev["q"][:n_gelu_out],
                          ev.dev["qneg_inv"][:n_gelu_out])

    if only is None or "ffn_gelu_ffn" in only:
        fn = jax.jit(f_ffn_chunk)
        out = fn(h_ffn.data, wi_digs[0], wf_digs[0])
        out.block_until_ready()
        t1 = time.perf_counter()
        acc = None
        for ci in range(len(wi_digs)):
            part = fn(h_ffn.data, wi_digs[ci], wf_digs[ci])
            qv = ev.dev["q"][:n_gelu_out].reshape(-1, 1)
            acc = part if acc is None else ma.add_mod(acc, part, qv)
        acc.block_until_ready()
        results["ffn_gelu_ffn"] = time.perf_counter() - t1
        if verbose:
            print(f"[moai] {'ffn_gelu_ffn':<24} "
                  f"{results['ffn_gelu_ffn']:8.3f} s "
                  f"({len(wi_digs)} chunks)")

    total = sum(results.values())
    per_input = total / dims.num_x
    res = {
        "preset": preset,
        "N": ctx.cfg.N,
        "num_inputs": dims.num_x,
        "stages_s": {k: round(v, 3) for k, v in results.items()},
        "stage_sum_s": round(total, 3),
        "amortized_s_per_input": round(per_input, 4),
        "ref_noboot_per_layer_s_per_input": round(REF_NOBOOT_PER_LAYER_S,
                                                  3),
        "vs_ref_stages": {
            k: round(REF_PER_LAYER_S[k] / (v / dims.num_x), 2)
            for k, v in results.items() if k in REF_PER_LAYER_S and v > 0},
        "setup_s": round(setup_s, 1),
    }
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="smoke", choices=list(PRESETS))
    ap.add_argument("--stages", default=None,
                    help="comma-separated stage subset")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()
    only = set(args.stages.split(",")) if args.stages else None
    res = run(args.preset, verbose=not args.quiet, only=only)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
