"""Multi-layer encrypted BERT stack where EVERY refresh is the REAL
bootstrap (no Recryptor anywhere) — the layer-loop composition of the
reference's all_layer_test (reference: test_full_scheme.hpp:339-1120:
4 bootstraps per layer :656-660, 746-765, 979-995, 1070-1087 plus one
inside softmax, softmax.hpp:529-536), stacked across layers through the
trailing refresh re-entry at n_att.

Runtime knob: MOAI_BOOT_LAYERS (default 2; 12 = the full reference loop
at these reduced dims).  Per-layer drift is asserted against the exact
plaintext chain with the same allowance as test_model_12layer.
"""

import os

import numpy as np
import pytest

from moai_tpu.params import CKKSConfig, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator
from moai_tpu.boot.bootstrap import Bootstrapper, make_refresh
from moai_tpu.ops.packing import batch_input, unpack_batch
from moai_tpu.models.bert import (BertDims, BertLayerWeights, DepthPlan,
                                  EncryptedBertModel, galois_steps_for_model,
                                  calibrate_domains, plain_bert_layer)

RNG = np.random.default_rng(91)

DIMS = BertDims(num_x=64, num_row=8, d_model=8, num_heads=1, head_dim=8,
                d_inter=16)
PLAN = DepthPlan(exp_r=4, inv_iters=3, ln_newton=2, ln_gold=0,
                 gelu_degree=8)
N_LAYERS = int(os.environ.get("MOAI_BOOT_LAYERS", "2"))
N_INPUTS = 2
LENS = np.array([8, 6])


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
def test_bert_stack_real_bootstrap():
    cfg = CKKSConfig(logN=10, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=27, n_boot_levels=0, dnum=7,
                     special_bits=29.5, hamming_weight=64)
    ctx = make_context(cfg)
    assert DIMS.num_x * DIMS.num_row == ctx.cfg.slots
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=505)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())

    weights = [rand_weights() for _ in range(N_LAYERS)]
    xs = RNG.normal(0, 0.6, (N_INPUTS, DIMS.num_row, DIMS.d_model))
    for j, ln_ in enumerate(LENS):
        xs[j, ln_:] = 0.0

    domains, max_table = calibrate_domains(xs, LENS, weights, DIMS)

    # plaintext chain + the magnitude of every refreshed intermediate
    # (softmax sums are pre-divided by num_row in softmax_exp_sum, so the
    # binding magnitudes are the activations: layer outputs, o_mm/f_mm
    # outputs, post-LN states)
    chains = []
    m_need = float(np.abs(xs).max())
    cur = [xs[j, :LENS[j]].copy() for j in range(N_INPUTS)]
    for w in weights:
        nxt = []
        for x in cur:
            from scipy.special import erf
            hd, H = DIMS.head_dim, DIMS.num_heads
            q = x @ w.wq / np.sqrt(hd) + w.bq / np.sqrt(hd)
            k = x @ w.wk + w.bk
            v = x @ w.wv + w.bv
            outs = []
            for h in range(H):
                sl = slice(h * hd, (h + 1) * hd)
                sc = q[:, sl] @ k[:, sl].T
                e = np.exp(sc - sc.max())
                outs.append(e / e.sum(-1, keepdims=True) @ v[:, sl])
            att = np.concatenate(outs, -1) @ w.wo + w.bo
            mu = (att + x).mean(-1, keepdims=True)
            sg = (att + x).std(-1, keepdims=True)
            h1 = w.ln1_g * (att + x - mu) / sg + w.ln1_b
            f = h1 @ w.wi + w.bi
            f = 0.5 * f * (1 + erf(f / np.sqrt(2)))
            fo = f @ w.wf + w.bf
            y = plain_bert_layer(x, w, DIMS)
            for vv in (att, x, h1, fo, fo + h1, y):
                m_need = max(m_need, float(np.abs(vv).max()))
            nxt.append(y)
        cur = nxt
        chains.append([c.copy() for c in cur])

    m_bound = 1.4 * max(m_need, 1.0)
    # EvalMod cosine-fit envelope: eps = m_bound * Delta / q0 must stay
    # where the deg-59 fit is proven (~0.03 at these q0/Delta)
    assert m_bound <= 9.0, f"test data exceeds EvalMod envelope: {m_bound}"

    bt = Bootstrapper(ev, enc, m_bound=m_bound)
    steps = sorted(set(bt.galois_steps()) | set(galois_steps_for_model(DIMS)))
    ev.galois_keys = kg.gen_galois_keys(steps=steps, conjugate=True)
    _refresh = make_refresh(bt, m_bound=m_bound)
    boot_out = ctx.L - 2 * bt.levels

    probe_n = [0]

    def refresh(ct, n_q):
        out = _refresh(ct, n_q)
        probe_n[0] += 1
        v_in = float(np.abs(decryptor.decrypt(ct).real).max())
        v_out = float(np.abs(decryptor.decrypt(out).real).max())
        print(f"[probe] refresh #{probe_n[0]}: |in|={v_in:.3f} "
              f"|out|={v_out:.3f} (n_q {ct.n_q}->{n_q})", flush=True)
        assert v_out < 4 * max(1.0, v_in) + 1.0, (probe_n[0], v_in, v_out)
        return out

    layer_errs = []

    def on_layer(i, ct):
        got_slots = decryptor.decrypt(ct).real
        got = unpack_batch(got_slots, DIMS.num_x, DIMS.num_row, N_INPUTS)
        err = max(float(np.abs(got[j, :LENS[j]] - chains[i][j]).max())
                  for j in range(N_INPUTS))
        layer_errs.append(err)
        print(f"[boot-stack] layer {i}: max drift {err:.4f}", flush=True)

    model = EncryptedBertModel(
        ev, enc, weights, DIMS, PLAN, LENS, refresh=refresh,
        max_table=max_table, domains=domains, on_layer=on_layer)
    assert model.layers[0].n_ln1 <= boot_out
    assert model.n_att <= boot_out

    x_ct = batch_input(encryptor, xs, DIMS.num_x, DIMS.num_row,
                       n_q=model.n_att)
    model(x_ct)

    assert len(layer_errs) == N_LAYERS
    for i, err in enumerate(layer_errs):
        assert err < 0.1 + 0.05 * (i + 1), (i, err)
