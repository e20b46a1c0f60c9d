"""End-to-end encrypted BERT layer vs plaintext numpy (tiny dims).

This is SURVEY.md §7.3's minimum end-to-end slice: one full transformer
layer (attention + FFN + LayerNorms) with the softmax bootstrap replaced
by the harness Recryptor, checked against an exact float reference (the
reference validates via golden CSVs + printed decrypts,
test_full_scheme.hpp:1048-1065)."""

import numpy as np
import pytest
from scipy.special import erf

from moai_tpu.params import CKKSConfig, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator
from moai_tpu.utils.recrypt import Recryptor
from moai_tpu.ops.packing import batch_input, unpack_batch
from moai_tpu.models.bert import (BertDims, BertLayerWeights, DepthPlan,
                                  EncryptedBertLayer, galois_steps_for_model)

RNG = np.random.default_rng(23)

DIMS = BertDims(num_x=128, num_row=8, d_model=16, num_heads=2, head_dim=8,
                d_inter=32)
PLAN = DepthPlan(exp_r=5, inv_iters=5, ln_newton=2, ln_gold=0,
                 gelu_degree=16)
N_INPUTS = 3
LENS = np.array([8, 8, 6])


def rand_weights() -> BertLayerWeights:
    d, hh, di = DIMS.d_model, DIMS.num_heads * DIMS.head_dim, DIMS.d_inter
    g = lambda *s: RNG.normal(0, 0.25, s)
    return BertLayerWeights(
        wq=g(d, hh), bq=g(hh) * 0.1, wk=g(d, hh), bk=g(hh) * 0.1,
        wv=g(d, hh), bv=g(hh) * 0.1, wo=g(d, d) * 0.5, bo=g(d) * 0.1,
        ln1_g=RNG.uniform(0.8, 1.2, d), ln1_b=g(d) * 0.1,
        wi=g(d, di) * 0.5, bi=g(di) * 0.1, wf=g(di, d) * 0.4, bf=g(d) * 0.1,
        ln2_g=RNG.uniform(0.8, 1.2, d), ln2_b=g(d) * 0.1)


def plain_layer(x, w: BertLayerWeights, lens):
    """Exact float reference for one input [T, d]."""
    T = x.shape[0]
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
        sm = e / e.sum(-1, keepdims=True)
        outs.append(sm @ v[:, sl])
    att = np.concatenate(outs, axis=-1) @ w.wo + w.bo
    h1 = ln(att + x, w.ln1_g, w.ln1_b)
    f = h1 @ w.wi + w.bi
    f = 0.5 * f * (1 + erf(f / np.sqrt(2)))
    f = f @ w.wf + w.bf
    return ln(f + h1, w.ln2_g, w.ln2_b), att, h1


@pytest.mark.slow
def test_bert_layer_end_to_end():
    cfg = CKKSConfig(logN=11, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=13, n_boot_levels=0, dnum=2,
                     hamming_weight=64)
    ctx = make_context(cfg)
    assert DIMS.num_x * DIMS.num_row == ctx.cfg.slots
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=31)
    gks = kg.gen_galois_keys(steps=galois_steps_for_model(DIMS))
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)
    rec = Recryptor(encryptor, decryptor)

    w = rand_weights()
    xs = RNG.normal(0, 0.6, (N_INPUTS, DIMS.num_row, DIMS.d_model))
    for j, ln_ in enumerate(LENS):
        xs[j, ln_:] = 0.0

    # plaintext reference + empirical domains
    want, att_ref, h1_ref = zip(*[plain_layer(xs[j, :LENS[j]], w, LENS[j])
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
        for h in range(DIMS.num_heads):
            sl = slice(h * DIMS.head_dim, (h + 1) * DIMS.head_dim)
            qmax = max(qmax, np.abs(q[:, sl] @ k[:, sl].T).max())

    layer = EncryptedBertLayer(
        ev, enc, w, DIMS, PLAN, LENS, max_table=float(qmax),
        refresh=lambda ct, n_q: rec.recrypt(ct, n_q=n_q),
        ln1_domain=(0.5 * S1.min(), 1.3 * S1.max()),
        ln2_domain=(0.5 * S2.min(), 1.3 * S2.max()),
        gelu_domain=float(1.2 * max(np.abs(f).max() for f in f_pre)))

    x_ct = batch_input(encryptor, xs, DIMS.num_x, DIMS.num_row,
                       n_q=layer.n_att)
    out = layer(x_ct)
    got_slots = decryptor.decrypt(out).real       # [d_model, slots]
    got = unpack_batch(got_slots, DIMS.num_x, DIMS.num_row, N_INPUTS)
    for j in range(N_INPUTS):
        g = got[j, :LENS[j]]
        err = np.abs(g - want[j]).max()
        assert err < 0.08, (j, err)
