"""EncryptedBertLayer driven by the REAL bootstrapper — the system test.

The reference's center of gravity is the layer loop with four real
bootstraps per layer plus one inside softmax (reference:
test_full_scheme.hpp:656-660, 746-765, 979-995, 1070-1087;
softmax.hpp:529-536).  Here the same composition runs at reduced
dimensions: every ``refresh`` is a full ModRaise -> CoeffToSlot ->
EvalMod -> SlotToCoeff pipeline (boot/bootstrap.py), no Recryptor
anywhere, and the output is checked against an exact float oracle.
"""

import numpy as np
import pytest
from scipy.special import erf

from moai_tpu.params import CKKSConfig, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator
from moai_tpu.boot.bootstrap import Bootstrapper, make_refresh
from moai_tpu.ops.packing import batch_input, unpack_batch
from moai_tpu.models.bert import (BertDims, BertLayerWeights, DepthPlan,
                                  EncryptedBertLayer, galois_steps_for_model)

RNG = np.random.default_rng(57)

M_BOUND = 8.0     # |activations| bound declared to the bootstrapper

DIMS = BertDims(num_x=32, num_row=8, d_model=8, num_heads=1, head_dim=8,
                d_inter=16)
PLAN = DepthPlan(exp_r=4, inv_iters=3, ln_newton=2, ln_gold=0,
                 gelu_degree=8)
N_INPUTS = 2
LENS = np.array([8, 6])


def boot_cfg(n_data_levels):
    return CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                      n_data_levels=n_data_levels, n_boot_levels=0, dnum=7,
                      special_bits=29.5, hamming_weight=64)


@pytest.mark.slow
def test_bootstrap_wide_range():
    """Bootstrap correctness for |m| up to M_BOUND (model activations are
    not confined to [-1, 1]); exercises the cubic arcsin correction."""
    cfg = boot_cfg(16)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=303)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc, m_bound=M_BOUND)
    assert bt.mr.arcsin_deg == 3
    ev.galois_keys = kg.gen_galois_keys(steps=bt.galois_steps(),
                                        conjugate=True)
    refresh = make_refresh(bt, m_bound=M_BOUND)
    v = RNG.uniform(-6.0, 6.0, ctx.cfg.slots)
    ct = encryptor.encrypt_values(v, n_q=ctx.n_q0 + 2)
    out = refresh(ct, ctx.n_q0 + 4)
    got = decryptor.decrypt(out)
    err = np.max(np.abs(got.real - v))
    assert err < 2e-2, err


def plain_layer(x, w: BertLayerWeights):
    hd, H = DIMS.head_dim, DIMS.num_heads

    def ln(v, gms, bts):
        mu = v.mean(-1, keepdims=True)
        sg = v.std(-1, keepdims=True)
        return gms * (v - mu) / sg + bts

    q = x @ w.wq / np.sqrt(hd) + w.bq / np.sqrt(hd)
    k = x @ w.wk + w.bk
    v = x @ w.wv + w.bv
    outs = []
    for h in range(H):
        sl = slice(h * hd, (h + 1) * hd)
        sc = q[:, sl] @ k[:, sl].T
        e = np.exp(sc - sc.max())
        outs.append(e / e.sum(-1, keepdims=True) @ v[:, sl])
    att = np.concatenate(outs, axis=-1) @ w.wo + w.bo
    h1 = ln(att + x, w.ln1_g, w.ln1_b)
    f = h1 @ w.wi + w.bi
    f = 0.5 * f * (1 + erf(f / np.sqrt(2)))
    f = f @ w.wf + w.bf
    return ln(f + h1, w.ln2_g, w.ln2_b), att, h1


def rand_weights() -> BertLayerWeights:
    d, hh, di = DIMS.d_model, DIMS.num_heads * DIMS.head_dim, DIMS.d_inter
    g = lambda *s: RNG.normal(0, 0.25, s)
    return BertLayerWeights(
        wq=g(d, hh), bq=g(hh) * 0.1, wk=g(d, hh), bk=g(hh) * 0.1,
        wv=g(d, hh), bv=g(hh) * 0.1, wo=g(d, d) * 0.15, bo=g(d) * 0.1,
        ln1_g=RNG.uniform(0.8, 1.2, d), ln1_b=g(d) * 0.1,
        wi=g(d, di) * 0.3, bi=g(di) * 0.1, wf=g(di, d) * 0.2, bf=g(d) * 0.1,
        ln2_g=RNG.uniform(0.8, 1.2, d), ln2_b=g(d) * 0.1)


@pytest.mark.slow
def test_bert_layer_real_bootstrap():
    """One full transformer layer where every refresh is the real
    bootstrap pipeline (the reference composition,
    test_full_scheme.hpp:484-1120)."""
    # chain: q0 (2) + bootstrap depth + deepest refresh re-entry target
    ctx = make_context(boot_cfg(27))
    assert DIMS.num_x * DIMS.num_row == ctx.cfg.slots
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=404)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())

    # probe every refresh (harness-side decrypt, the reference's debug-
    # print analog): localizes any bootstrap divergence to the call site
    probe_log = []

    def refresh(ct, n_q):
        v_in = float(np.abs(decryptor.decrypt(ct).real).max())
        out = _refresh(ct, n_q)
        v_out = float(np.abs(decryptor.decrypt(out).real).max())
        probe_log.append((ct.n_q, n_q, v_in, v_out))
        print(f"[probe] refresh #{len(probe_log)}: |in|={v_in:.3f} "
              f"|out|={v_out:.3f} (n_q {ct.n_q}->{n_q})", flush=True)
        if not v_out < 4 * max(1.0, v_in) + 1.0:
            # dump the diverging input for offline stage-by-stage
            # diagnosis (tools/debug_refresh2.py --dump): one failing run
            # is then fully diagnostic
            from moai_tpu.serial import save_ciphertext, save_secret_key
            tag = f"/tmp/boot_fail_r{len(probe_log)}"
            save_ciphertext(tag + "_in.npz", ct, cfg=ctx.cfg)
            save_secret_key(tag + "_sk.npz", kg.sk)
            print(f"[probe] dumped failing ct -> {tag}_in.npz "
                  f"(m_bound={m_bound})", flush=True)
            raise AssertionError((len(probe_log), v_in, v_out))
        return out

    w = rand_weights()
    xs = RNG.normal(0, 0.6, (N_INPUTS, DIMS.num_row, DIMS.d_model))
    for j, ln_ in enumerate(LENS):
        xs[j, ln_:] = 0.0

    want, att_ref, h1_ref = zip(*[plain_layer(xs[j, :LENS[j]], w)
                                  for j in range(N_INPUTS)])
    d = DIMS.d_model
    pre1 = [a + xs[j, :LENS[j]] for j, a in enumerate(att_ref)]
    S1 = np.concatenate([((d * v - v.sum(-1, keepdims=True)) ** 2
                          ).sum(-1) for v in pre1])
    f_pre = [h @ w.wi + w.bi for h in h1_ref]
    f_post = [(0.5 * f * (1 + erf(f / np.sqrt(2)))) @ w.wf + w.bf
              for f in f_pre]
    pre2 = [f_post[j] + h1_ref[j] for j in range(N_INPUTS)]
    S2 = np.concatenate([((d * v - v.sum(-1, keepdims=True)) ** 2
                          ).sum(-1) for v in pre2])
    qmax = 0.0
    for j in range(N_INPUTS):
        x = xs[j, :LENS[j]]
        q = x @ w.wq / np.sqrt(DIMS.head_dim) + w.bq / np.sqrt(DIMS.head_dim)
        k = x @ w.wk + w.bk
        qmax = max(qmax, np.abs(q @ k.T).max())

    # every refreshed value's plaintext magnitude, with margin — the first
    # committed run of this test diverged because the hard-coded M_BOUND=8
    # undershot the real post-W_O activations (|17.9|): values outside the
    # declared bound land outside EvalMod's approximation intervals
    f_post_flat = [f_post[j] + h1_ref[j] for j in range(N_INPUTS)]
    # the EvalMod cosine fit is proven to eps = m_bound*Delta/q0 ~ 0.03
    # (m_bound 8 at these q0/Delta; the first rerun showed m_bound ~25
    # pushes eps to ~0.1 where the deg-59 fit collapses): weights above
    # are scaled so activations stay inside that envelope
    m_bound = float(1.4 * max(
        max(np.abs(a).max() for a in att_ref),
        float(np.abs(xs).max()),
        max(np.abs(f).max() for f in f_post),
        max(np.abs(h).max() for h in h1_ref),
        max(np.abs(v).max() for v in f_post_flat),
        max(np.abs(v).max() for v in want), 1.0))
    assert m_bound <= 9.0, f"test data exceeds EvalMod envelope: {m_bound}"
    bt = Bootstrapper(ev, enc, m_bound=m_bound)
    steps = sorted(set(bt.galois_steps()) | set(galois_steps_for_model(DIMS)))
    ev.galois_keys = kg.gen_galois_keys(steps=steps, conjugate=True)
    _refresh = make_refresh(bt, m_bound=m_bound)
    # the bootstrap must resurface above the deepest re-entry level
    boot_out = ctx.L - 2 * bt.levels

    layer = EncryptedBertLayer(
        ev, enc, w, DIMS, PLAN, LENS, max_table=float(qmax),
        refresh=refresh,
        ln1_domain=(0.5 * S1.min(), 1.3 * S1.max()),
        ln2_domain=(0.5 * S2.min(), 1.3 * S2.max()),
        gelu_domain=float(1.2 * max(np.abs(f).max() for f in f_pre)))
    assert layer.n_ln1 <= boot_out, (layer.n_ln1, boot_out)
    assert layer.n_att <= boot_out, (layer.n_att, boot_out)

    x_ct = batch_input(encryptor, xs, DIMS.num_x, DIMS.num_row,
                       n_q=layer.n_att)
    out = layer(x_ct)
    got_slots = decryptor.decrypt(out).real
    got = unpack_batch(got_slots, DIMS.num_x, DIMS.num_row, N_INPUTS)
    for j in range(N_INPUTS):
        g = got[j, :LENS[j]]
        err = np.abs(g - want[j]).max()
        assert err < 0.15, (j, err)
