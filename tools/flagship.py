"""Flagship stage bench: every stage of one encrypted BERT layer at real
dimensions, each timed at the level the reference runs it — the direct
analog of paper Table 3 (reference: test_full_scheme.hpp:484-1120 with
per-stage prints :528-555; Table 3 levels: QKV 15->14, QKT 14->13,
softmax 13->3, AV 3->2, W_O 2->1, LN 21->1, FFN 10->9, GELU 9->2,
W_F 2->1).

Memory design (fits the 16 GB v5e at logN=15, d_model=768):
- Every stage allocates its own inputs and frees them after; nothing from
  a previous stage stays resident.
- Keys are generated ONCE, pulled to host, and per stage only the keys
  that stage needs are uploaded, SLICED to the stage's working level
  (keys.slice_kswitch — a key mod a chain prefix is still valid).
- The column axis is chunked everywhere it is wide: CPMM accumulates
  [j_chunk x i_chunk] partial matmuls, LayerNorm runs its 3 passes in
  col_chunk batches, the FFN pipelines d_inter in i-chunks, and the
  QKT CCMM uses the double-BSGS col_chunk path.
- Timing inputs are uniform residue tensors (every evaluator kernel is
  branchless/data-oblivious, so wall time does not depend on values);
  numerical correctness is covered by tests/ and the golden suite.
- Keys and weight digits travel as jit ARGUMENTS (keeps HLO bodies small
  for the remote compiler and lets stages free them).

Per-input amortization: stage seconds / num_x interleaved inputs
(reference convention, README.md:29-31).  ``vs_ref_stages`` ratios are
printed ONLY at the reference's real dims (num_row=128, d_model=768) —
at smoke dims they would be meaningless.

Usage: python tools/flagship.py --preset {smoke,n15} [--stages a,b,...]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)

import argparse
import functools
import gc
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
                  ln_newton=2, ln_gold=1, dnum=2,
                  j_chunk=32, i_chunk=32, ln_chunk=32, ffn_i_chunk=32,
                  ccmm_col_chunk=16, reps=1),
    "n15": dict(logN=15, num_x=128, num_row=128, d_model=768, num_heads=12,
                head_dim=64, d_inter=3072, exp_r=7, inv_iters=16,
                ln_newton=3, ln_gold=1, dnum=3,
                j_chunk=256, i_chunk=192, ln_chunk=16, ffn_i_chunk=64,
                ccmm_col_chunk=16, reps=1),
}


def run(preset: str, verbose: bool = True, only=None) -> dict:
    import jax
    import jax.numpy as jnp
    from moai_tpu import mod_arith as ma
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import (KeyGenerator, KSwitchKey, GaloisKeys,
                               slice_kswitch)
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ciphertext import Ciphertext, Plaintext
    from moai_tpu.ops.packing import bias_vec
    from moai_tpu.ops.matmul import (ccmm_col_to_diag, ccmm_diag_to_col,
                                     ccmm_col_steps, ccmm_diag_steps)
    from moai_tpu.ops.nonlinear import (softmax_diag, softmax_pts, layernorm,
                                        gelu, diag_valid_masks, encode_plain,
                                        inverse_goldschmidt)
    from moai_tpu.modmat import (host_weight_digits, host_bucket_consts,
                                 mod_matmul)
    from moai_tpu.models.bert import BertDims

    p = PRESETS[preset]
    dims = BertDims(num_x=p["num_x"], num_row=p["num_row"],
                    d_model=p["d_model"], num_heads=p["num_heads"],
                    head_dim=p["head_dim"], d_inter=p["d_inter"])
    real_dims = dims.num_row == 128 and dims.d_model == 768
    ln_depth = 6 + 3 * p["ln_newton"] + 2 * p["ln_gold"]
    # inverse with reland_every=4: drift re-landing costs one extra level
    # per 4 squarings (on this ladder the unrelanded 16-iter chain's scale
    # OVERFLOWS float64 — pair products sit ~0.11 bits off Delta and the
    # log-drift doubles per squaring; see inverse_goldschmidt docstring)
    inv_depth = p["inv_iters"] + 1 + max(0, (p["inv_iters"] - 1) // 4)
    n_levels = max(16, ln_depth + 2, inv_depth + 3)
    cfg = CKKSConfig(logN=p["logN"], q0_bits=(30.0, 30.0),
                     data_pair_bits=26.0, n_data_levels=n_levels,
                     n_boot_levels=0, dnum=p["dnum"], hamming_weight=192)
    ctx = make_context(cfg)
    assert dims.num_x * dims.num_row == ctx.cfg.slots
    enc = Encoder(ctx)
    N = ctx.cfg.N
    scale = ctx.scale
    q0 = ctx.n_q0
    hd, H = dims.head_dim, dims.num_heads
    L = ctx.L

    def lv(k):     # composite level k above q0 -> prime count
        return min(L, q0 + 2 * k)

    # ---- keygen once; keys stay DEVICE-resident at full L ---------------
    # (the whole key set is ~1.3 GB at n15 — far cheaper to keep on-chip
    # than to re-upload sliced copies per stage over the tunnel; per-stage
    # slicing matters only at N=2^16 where a key is ~270 MB, see
    # tools/flagship_n16.py)
    t0 = time.perf_counter()
    kg = KeyGenerator(ctx, seed=11)
    steps = sorted(set(ccmm_col_steps(dims.num_x, dims.num_row)
                       + ccmm_diag_steps(dims.num_x, dims.num_row)))
    gks_dev = kg.gen_galois_keys(steps=steps)
    dev_gal = {g: k.data for g, k in gks_dev.keys.items()}
    perms = gks_dev.perms
    dev_relin = kg.gen_relin_key().data
    jax.block_until_ready(dev_relin)
    del gks_dev, kg
    gc.collect()
    setup_s = time.perf_counter() - t0
    if verbose:
        print(f"[moai] setup (keygen)            {setup_s:8.1f} s "
              f"({len(dev_gal)} galois keys)", flush=True)
    if only is not None and not ({"qkt_ccmm", "av_ccmm"} & set(only)):
        dev_gal = {}          # free ~1.5 GB for rotation-free stage runs
        gc.collect()

    ev = Evaluator(ctx)
    rng = np.random.default_rng(3)
    lens = np.full(min(8, dims.num_x), dims.num_row)
    mask = bias_vec(lens, dims.num_x, dims.num_row, ctx.cfg.slots)
    masks = diag_valid_masks(lens, dims.num_x, dims.num_row, ctx.cfg.slots)

    q_dev = ev.dev["q"]
    _fake_seed = [0]

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _fake(seed, ncols, n_q):
        bits = jax.random.bits(jax.random.PRNGKey(seed),
                               (ncols, 2, n_q, N), dtype=jnp.uint32)
        return bits % q_dev[:n_q].reshape(-1, 1)

    def fake_ct(ncols, n_q):
        """Uniform residue tensor shaped like a ciphertext batch (valid
        Montgomery representatives; kernels are data-oblivious).  Generated
        ON DEVICE — multi-GB host uploads over the tunneled TPU dominated
        the wall clock otherwise."""
        _fake_seed[0] += 1
        return Ciphertext(_fake(_fake_seed[0], ncols, n_q), scale, True)

    def upload_keys(n_q, galois=False, relin=True):
        """Per-stage key pytree (device-resident, full L)."""
        out = {}
        if relin:
            out["relin"] = dev_relin
        if galois:
            out["gal"] = dev_gal
        return out

    def sliced_keys(n_q, galois=False, relin=True):
        """Per-stage key pytree SLICED to the stage level (a key mod a
        chain prefix is still valid; keys.slice_kswitch).  Low-level
        stages keep only n_q + K limbs resident instead of full L —
        the AV stage at 8 limbs saves ~1 GB of key HBM."""
        out = {}
        if relin:
            out["relin"] = slice_kswitch(KSwitchKey(dev_relin), n_q, L).data
        if galois:
            out["gal"] = {g: slice_kswitch(KSwitchKey(d), n_q, L).data
                          for g, d in dev_gal.items()}
        return out

    def bind_keys(keys, n_q, q_limbs=None):
        # q_limbs: Q limbs present in SLICED key tensors (static — must
        # come in via closure, not the traced pytree)
        if "relin" in keys:
            ev.relin_key = KSwitchKey(keys["relin"], q_limbs=q_limbs)
        if "gal" in keys:
            ev.galois_keys = GaloisKeys(
                {g: KSwitchKey(d, q_limbs=q_limbs)
                 for g, d in keys["gal"].items()}, perms)

    def unbind():
        ev.relin_key = None
        ev.galois_keys = None
        ev._perm_cache.clear()

    def w_digits(J, I, n_q, w_scale):
        Wm = rng.normal(0, 0.05, (J, I))
        qs = ctx.q_primes[:n_q]
        res = np.empty((n_q, J, I), dtype=np.uint32)
        wi64 = np.round(Wm * w_scale).astype(np.int64)
        for li, qq in enumerate(qs):
            res[li] = (wi64 % qq).astype(np.uint32)
        return jnp.asarray(host_weight_digits(res))

    def buckets(n_q):
        bm, bo = host_bucket_consts(ctx.q_primes[:n_q])
        return jnp.asarray(bm), jnp.asarray(bo)

    results = {}

    def block(x):
        jax.tree_util.tree_map(
            lambda l: l.block_until_ready()
            if hasattr(l, "block_until_ready") else None, x)

    def record(name, dt, note=""):
        results[name] = dt
        if verbose:
            print(f"[moai] {name:<24} {dt:8.3f} s  {note}", flush=True)

    def want(name):
        return only is None or name in only

    # =====================================================================
    # QKV CPMM (reference 15->14; V at 4->3).  Chunked accumulate:
    # out[i-chunk] = sum over j-chunks of modmatmul(x[j-chunk], W-chunk),
    # then mask-multiply + rescale_pair + bias — identical op sequence to
    # ops.matmul.CPMM, chunk-partitioned.
    # =====================================================================
    if want("qkv_cpmm"):
        jc, ic = p["j_chunk"], p["i_chunk"]
        d = dims.d_model
        nj, ni = -(-d // jc), -(-(H * hd) // ic)

        def stage_cpmm(n_q):
            bm, bo = buckets(n_q)
            w_sc = float(ctx.q_primes[n_q - 1])        # masked variant
            mask_sc = float(ctx.q_primes[n_q - 2])
            mask_pt = encode_plain(ev, enc, mask, mask_sc, n_q)
            x_chunk = fake_ct(jc, n_q)
            wd = [w_digits(jc, ic, n_q, w_sc) for _ in range(ni)]
            bias = rng.normal(0, 0.05, ic)

            def f_mm(xd, wdig, acc):
                part = mod_matmul(xd, wdig, bm, bo,
                                  ev.dev["q"][:n_q], ev.dev["qneg_inv"][:n_q])
                return part if acc is None else \
                    ma.add_mod(acc, part, ev.dev["q"][:n_q].reshape(-1, 1))

            def f_fin(acc, mpt):
                ct = Ciphertext(acc, scale * w_sc, True)
                ct = ev.multiply_plain(ct, Plaintext(mpt, mask_sc))
                ct = ev.rescale_pair(ct)
                return ev.add_const_vec(ct, bias).data

            jf_mm = jax.jit(f_mm)
            jf_fin = jax.jit(f_fin)
            # compile BOTH accumulator variants (acc=None vs acc=array is a
            # different pytree -> different executable; an unwarmed variant
            # would compile inside the timing loop)
            acc = jf_mm(x_chunk.data, wd[0], None)
            if nj > 1:
                acc = jf_mm(x_chunk.data, wd[0], acc)
            out = jf_fin(acc, mask_pt.data)
            block(out)
            # block each independent chain as it completes: the async
            # dispatcher runs independent chains CONCURRENTLY — blocking
            # only the last undermeasures, and letting all chains fly
            # OOMs the chip (each holds GBs of temps)
            t0 = time.perf_counter()
            for ii in range(ni):
                acc = None
                for ji in range(nj):
                    acc = jf_mm(x_chunk.data, wd[ii], acc)
                out = jf_fin(acc, mask_pt.data)
                block(out)
            dt = time.perf_counter() - t0
            del x_chunk, wd, acc, out, mask_pt
            gc.collect()
            return dt

        qk_s = 2 * stage_cpmm(lv(15))     # Q and K at attention level
        v_s = stage_cpmm(lv(4))           # V at the post-softmax level
        record("qkv_cpmm", qk_s + v_s,
               f"(QK {qk_s:.3f} + V {v_s:.3f}, {nj}x{ni} chunks)")

    # =====================================================================
    # QK^T CCMM per head (14->13): double-BSGS col->diag, all heads
    # =====================================================================
    if want("qkt_ccmm"):
        from moai_tpu.ops.matmul import (ccmm_col_to_diag_partial,
                                         ccmm_col_to_diag_finish)
        n_qk = lv(14)
        keys = upload_keys(n_qk, galois=True)
        cc = p["ccmm_col_chunk"]
        qh, kh = fake_ct(cc, n_qk), fake_ct(cc, n_qk)
        n_chunks = -(-hd // cc)

        # per-chunk jits: ONE monolithic head graph took >20 min to
        # compile; the chunk partial + finish compile in minutes and the
        # python loop replays them (same math: partials ADD)
        def f_part(qd, kd, ks):
            bind_keys(ks, n_qk)
            return ccmm_col_to_diag_partial(
                ev, Ciphertext(qd, scale, True),
                Ciphertext(kd, scale, True), dims.num_x, dims.num_row)

        def f_acc(acc, part):
            return ma.add_mod(acc, part,
                              ev.dev["q"][:n_qk].reshape(-1, 1))

        def f_fin(acc, ks):
            bind_keys(ks, n_qk)
            return ccmm_col_to_diag_finish(
                ev, acc, scale * scale, dims.num_x, dims.num_row).data

        jf_part = jax.jit(f_part)
        jf_acc = jax.jit(f_acc)
        jf_fin = jax.jit(f_fin)
        acc = jf_part(qh.data, kh.data, keys)
        unbind()
        acc = jf_acc(acc, acc)
        out = jf_fin(acc, keys)
        unbind()
        block(out)
        del acc, out
        t0 = time.perf_counter()
        for h_i in range(H):
            acc = None
            for _c in range(n_chunks):
                part = jf_part(qh.data, kh.data, keys)
                acc = part if acc is None else jf_acc(acc, part)
            out = jf_fin(acc, keys)
            # block every 4 heads: amortizes the ~200 ms/dispatch tunnel
            # round-trip (the r4 per-head-blocked number paid it 12x; the
            # device executes queued programs back-to-back either way)
            # while bounding queued output buffers
            if (h_i + 1) % 4 == 0 or h_i + 1 == H:
                block(out)
        unbind()
        record("qkt_ccmm", time.perf_counter() - t0,
               f"({H} heads x {n_chunks} chunks, blocked every 4 heads)")
        del qh, kh, keys, out, acc, part
        gc.collect()

    # =====================================================================
    # softmax (13 -> refresh slot -> out), all heads.
    # part 1: exp + mask + sum; part 2: Goldschmidt inverse of the
    # refreshed sum + final exp*inv multiply (the reference bootstraps the
    # single sum ciphertext between the parts).
    # =====================================================================
    if want("softmax"):
        n_sm = lv(13)
        sm_in = fake_ct(dims.num_row, n_sm)
        keys = upload_keys(n_sm)
        neg_pt, mask_pt = softmax_pts(ev, enc, masks, 4.0, scale, n_sm,
                                      exp_r=p["exp_r"])

        def f_sm_exp(sd, ks, npd, mpd):
            bind_keys(ks, n_sm)
            ct = Ciphertext(sd, scale, True)
            pts = (Plaintext(npd, neg_pt.scale),
                   Plaintext(mpd, mask_pt.scale))
            return softmax_diag(ev, enc, ct, masks, max_val=4.0,
                                refresh=lambda c: c,
                                inv_iters=0, exp_r=p["exp_r"],
                                pts=pts).data

        jf = jax.jit(f_sm_exp)
        out = jf(sm_in.data, keys, neg_pt.data, mask_pt.data)
        unbind()
        block(out)
        t0 = time.perf_counter()
        for h_i in range(H):
            out = jf(sm_in.data, keys, neg_pt.data, mask_pt.data)
            if (h_i + 1) % 4 == 0 or h_i + 1 == H:
                block(out)      # see qkt note: amortize tunnel dispatch
        unbind()
        part1 = time.perf_counter() - t0
        del sm_in, out, keys, neg_pt, mask_pt
        gc.collect()

        n_inv = lv(inv_depth + 2)
        keys = upload_keys(n_inv)
        s_ct = fake_ct(1, n_inv)
        e_ct = fake_ct(dims.num_row, n_inv)

        def f_sm_inv(sd, ed, ks):
            bind_keys(ks, n_inv)
            s = Ciphertext(sd[0], scale, True)
            s = ev.add_const(s, 0.7)           # keep 1/x domain sane
            inv = inverse_goldschmidt(ev, s, p["inv_iters"],
                                      reland_every=4)
            e = Ciphertext(ed, scale, True)
            en, invn = ev.align(e, inv)
            return ev.mul_relin_rescale(
                en, invn.with_data(jnp.broadcast_to(
                    invn.data[None], en.data.shape))).data

        jf2 = jax.jit(f_sm_inv)
        out2 = jf2(s_ct.data, e_ct.data, keys)
        unbind()
        block(out2)
        t0 = time.perf_counter()
        for h_i in range(H):
            out2 = jf2(s_ct.data, e_ct.data, keys)
            if (h_i + 1) % 4 == 0 or h_i + 1 == H:
                block(out2)     # see qkt note
        unbind()
        part2 = time.perf_counter() - t0
        record("softmax", part1 + part2,
               f"(exp/sum {part1:.3f} + inv/mult {part2:.3f}, {H} heads)")
        del s_ct, e_ct, out2, keys
        gc.collect()

    # =====================================================================
    # softmax*V diag->col CCMM (3->2), all heads
    # =====================================================================
    if want("av_ccmm"):
        n_av = lv(3)
        keys = sliced_keys(n_av, galois=True)
        # heads are batched into a leading axis via lax.map (ONE dispatch
        # per hb heads, ONE traced head body): vmap'd heads schedule all
        # heads' key-switch temporaries concurrently — hb=2 compiled to a
        # 21.7 GB schedule on the 15.75 GB chip (r5 first rerun); lax.map
        # serializes the head loop on-device so one head's working set is
        # live at a time while still amortizing the ~200 ms tunnel
        # dispatch across all heads
        hb = min(4, H)
        av_a = fake_ct(hb * dims.num_row, n_av)
        av_v = fake_ct(hb * hd, n_av)

        def f_av(ad, vd, ks):
            bind_keys(ks, n_av, q_limbs=n_av)

            def one(args):
                a1, v1 = args
                return ccmm_diag_to_col(
                    ev, Ciphertext(a1, scale, True),
                    Ciphertext(v1, scale, True),
                    dims.num_x, dims.num_row).data

            a = ad.reshape((hb, dims.num_row) + ad.shape[1:])
            v = vd.reshape((hb, hd) + vd.shape[1:])
            return jax.lax.map(one, (a, v))

        jf = jax.jit(f_av)
        out = jf(av_a.data, av_v.data, keys)
        unbind()
        block(out)
        t0 = time.perf_counter()
        for h_i in range(0, H, hb):
            out = jf(av_a.data, av_v.data, keys)
            block(out)
        unbind()
        record("av_ccmm", time.perf_counter() - t0,
               f"({H} heads, {hb} vmapped per dispatch)")
        del av_a, av_v, keys, out
        gc.collect()

    # =====================================================================
    # self-output CPMM 768->768 (2->1) — low level, no chunking needed
    # =====================================================================
    if want("self_output_cpmm"):
        n_so = lv(2)
        bm, bo = buckets(n_so)
        w_sc = float(ctx.q_primes[n_so - 1]) * float(ctx.q_primes[n_so - 2])
        att = fake_ct(dims.d_model, n_so)
        wd = w_digits(dims.d_model, dims.d_model, n_so, w_sc)
        bias = rng.normal(0, 0.05, dims.d_model)

        def f_so(xd, wdig):
            out = mod_matmul(xd, wdig, bm, bo, ev.dev["q"][:n_so],
                             ev.dev["qneg_inv"][:n_so])
            ct = ev.rescale_pair(Ciphertext(out, scale * w_sc, True))
            return ev.add_const_vec(ct, bias).data

        jf = jax.jit(f_so)
        out = jf(att.data, wd)
        block(out)
        t0 = time.perf_counter()
        out = jf(att.data, wd)
        block(out)
        record("self_output_cpmm", time.perf_counter() - t0)
        del att, wd, out
        gc.collect()

    # =====================================================================
    # LayerNorm x2 (reference 21->1 each) — chunked 3-pass layernorm
    # =====================================================================
    if want("layernorm_x2"):
        n_ln = lv(ln_depth + 1)
        keys = upload_keys(n_ln)
        # at d_model=768 the un-donatable 38-limb input (7.6 GB) plus the
        # LN program (~8.9 GB regardless of col_chunk) exceeds HBM; run
        # two 384-column halves and report 2x one half — per-column work
        # is identical, only the single-ciphertext rsqrt is double-counted
        # (a ~1% over-estimate; noted in the stage note)
        ln_cols = dims.d_model if dims.d_model <= 64 else dims.d_model // 2
        ln_halves = dims.d_model // ln_cols
        g_v = rng.uniform(0.8, 1.2, ln_cols)
        b_v = rng.normal(0, 0.05, ln_cols)

        def f_ln(hdata, ks):
            bind_keys(ks, n_ln)
            ct = Ciphertext(hdata, scale, True)
            return layernorm(ev, ct, g_v, b_v,
                             var_domain=(0.05 * dims.d_model ** 2,
                                         2.0 * dims.d_model ** 2),
                             newton_iters=p["ln_newton"],
                             gold_iters=p["ln_gold"],
                             col_chunk=p["ln_chunk"]).data

        jf = jax.jit(f_ln, donate_argnums=(0,))
        h_ln = fake_ct(ln_cols, n_ln)
        out = jf(h_ln.data, keys)
        unbind()
        block(out)
        del h_ln, out
        gc.collect()
        t_sum = 0.0
        for _rep in range(2 * ln_halves):      # LN x2, each in halves
            h1 = fake_ct(ln_cols, n_ln)
            t0 = time.perf_counter()
            out = jf(h1.data, keys)
            block(out)
            t_sum += time.perf_counter() - t0
            del h1, out
            gc.collect()
        unbind()
        record("layernorm_x2", t_sum,
               f"({2 * ln_halves} x {ln_cols}-col halves; shared rsqrt "
               f"double-counted)")
        del keys
        gc.collect()

    # =====================================================================
    # FFN: W_I CPMM (10->9) + GELU (9->2) + W_F CPMM (2->1), pipelined
    # over d_inter i-chunks; W_F outputs accumulate into [d_model] cols
    # =====================================================================
    if want("ffn_gelu_ffn"):
        gelu_deg = 24
        gelu_depth = 2 + max(1, (gelu_deg - 1).bit_length())
        n_ffn = lv(10)
        n_go = n_ffn - 2 - 2 * gelu_depth          # post-GELU level
        keys = upload_keys(n_ffn)
        fic = p["ffn_i_chunk"]
        jc = min(p["j_chunk"], dims.d_model)
        nj = -(-dims.d_model // jc)
        n_ic = dims.d_inter // fic
        bm_i, bo_i = buckets(n_ffn)
        bm_f, bo_f = buckets(n_go)
        wi_sc = float(ctx.q_primes[n_ffn - 1]) * float(ctx.q_primes[n_ffn - 2])
        wf_sc = float(ctx.q_primes[n_go - 1]) * float(ctx.q_primes[n_go - 2])
        x_chunk = fake_ct(jc, n_ffn)
        n_wmat = min(n_ic, 4)       # distinct weight chunks cycled (timing
        wi_d = [w_digits(jc, fic, n_ffn, wi_sc)    # is weight-oblivious)
                for _ in range(n_wmat)]
        wf_d = [w_digits(fic, dims.d_model, n_go, wf_sc)
                for _ in range(n_wmat)]

        def f_wi(xd, wdig, acc):
            part = mod_matmul(xd, wdig, bm_i, bo_i, ev.dev["q"][:n_ffn],
                              ev.dev["qneg_inv"][:n_ffn])
            return part if acc is None else \
                ma.add_mod(acc, part, ev.dev["q"][:n_ffn].reshape(-1, 1))

        def f_gelu_wf(acc, wfdig, out_acc, ks):
            bind_keys(ks, n_ffn)
            f = ev.rescale_pair(Ciphertext(acc, scale * wi_sc, True))
            f = gelu(ev, f, domain=16.0, degree=gelu_deg)
            f = ev.mod_drop_to(f, n_go)
            part = mod_matmul(f.data, wfdig, bm_f, bo_f,
                              ev.dev["q"][:n_go], ev.dev["qneg_inv"][:n_go])
            return part if out_acc is None else \
                ma.add_mod(out_acc, part, ev.dev["q"][:n_go].reshape(-1, 1))

        jf_wi = jax.jit(f_wi)
        jf_gw = jax.jit(f_gelu_wf)
        # warm BOTH accumulator variants of each fn (see qkv note)
        acc = jf_wi(x_chunk.data, wi_d[0], None)
        if nj > 1:
            acc = jf_wi(x_chunk.data, wi_d[0], acc)
        out = jf_gw(acc, wf_d[0], None, keys)
        if n_ic > 1:
            out = jf_gw(acc, wf_d[0], out, keys)
        unbind()
        block(out)
        del acc, out
        t0 = time.perf_counter()
        out_acc = None
        per_ci = []
        for ci in range(n_ic):
            t_ci = time.perf_counter()
            acc = None
            for ji in range(nj):
                acc = jf_wi(x_chunk.data, wi_d[ci % n_wmat], acc)
            out_acc = jf_gw(acc, wf_d[ci % n_wmat], out_acc, keys)
            block(out_acc)      # bound in-flight chains (async dispatch)
            per_ci.append(time.perf_counter() - t_ci)
        block(out_acc)
        # paranoia: force a value fetch so a lazily-satisfied block can
        # never record a did-not-run time (the r5 first rerun recorded
        # 0.02 s for 24 GELU chains — physically impossible)
        checksum = int(jnp.sum(out_acc[..., 0, 0, :64].astype(jnp.uint64)))
        unbind()
        record("ffn_gelu_ffn", time.perf_counter() - t0,
               f"({n_ic} i-chunks x {nj} j-chunks; per-ci "
               f"{min(per_ci):.3f}..{max(per_ci):.3f} s; "
               f"checksum {checksum % 100000})")
        del x_chunk, wi_d, wf_d, acc, out_acc, keys
        gc.collect()

    total = sum(results.values())
    per_input = total / dims.num_x
    res = {
        "preset": preset,
        "backend": jax.default_backend(),
        "N": ctx.cfg.N,
        "num_inputs": dims.num_x,
        "dims": dict(num_row=dims.num_row, d_model=dims.d_model,
                     num_heads=H, d_inter=dims.d_inter),
        "stages_s": {k: round(v, 3) for k, v in results.items()},
        "stage_sum_s": round(total, 3),
        "amortized_s_per_input": round(per_input, 4),
        "ref_noboot_per_layer_s_per_input": round(REF_NOBOOT_PER_LAYER_S, 3),
        "setup_s": round(setup_s, 1),
    }
    if real_dims:
        res["vs_ref_stages"] = {
            k: round(REF_PER_LAYER_S[k] / (v / dims.num_x), 2)
            for k, v in results.items() if k in REF_PER_LAYER_S and v > 0}
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
