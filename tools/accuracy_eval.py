"""Encrypted-vs-plaintext task accuracy harness — the paper Table 4 analog.

The reference scores GLUE (SST-2/QNLI/RTE) by running the encrypted
12-layer encoder + classifier and counting decision matches against the
plaintext model (paper §6.2 Table 4: e.g. SST-2 1818 match / 4 mismatch).
This harness reproduces that *metric* end-to-end:

    inputs -> EncryptedBertModel -> [CLS]-token pool -> plaintext
    classifier -> argmax   vs   the identical plaintext pipeline

Weights: the reference repo's large weight CSVs are stripped
(.MISSING_LARGE_BLOBS) and this environment has no network, so by
default the model is synthesized (deterministic BERT-magnitude weights +
a linear probe classifier trained on plaintext features, so decisions
are non-trivial).  Pass --hf-dir with a local bert-base-uncased
checkpoint directory to score real weights; the pipeline is identical.

Outputs one JSON line: {"n": ..., "match": ..., "mismatch": ...,
"agreement": ...} — directly comparable to Table 4's match/mismatch
columns.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)


import argparse
import json

import numpy as np


def softmax_np(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def load_hf_weights(hf_dir, dims, n_layers):
    """Local HuggingFace bert checkpoint -> list[BertLayerWeights]."""
    import torch
    from moai_tpu.models.bert import BertLayerWeights
    sd = torch.load(f"{hf_dir}/pytorch_model.bin", map_location="cpu")

    def g(k):
        return sd[k].numpy().astype(np.float64)

    out = []
    for i in range(n_layers):
        p = f"bert.encoder.layer.{i}."
        out.append(BertLayerWeights(
            wq=g(p + "attention.self.query.weight").T,
            bq=g(p + "attention.self.query.bias"),
            wk=g(p + "attention.self.key.weight").T,
            bk=g(p + "attention.self.key.bias"),
            wv=g(p + "attention.self.value.weight").T,
            bv=g(p + "attention.self.value.bias"),
            wo=g(p + "attention.output.dense.weight").T,
            bo=g(p + "attention.output.dense.bias"),
            ln1_g=g(p + "attention.output.LayerNorm.weight"),
            ln1_b=g(p + "attention.output.LayerNorm.bias"),
            wi=g(p + "intermediate.dense.weight").T,
            bi=g(p + "intermediate.dense.bias"),
            wf=g(p + "output.dense.weight").T,
            bf=g(p + "output.dense.bias"),
            ln2_g=g(p + "output.LayerNorm.weight"),
            ln2_b=g(p + "output.LayerNorm.bias")))
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator
    from moai_tpu.encrypt import Encryptor, Decryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.utils.recrypt import Recryptor
    from moai_tpu.ops.packing import batch_input, unpack_batch
    from moai_tpu.models.bert import (BertDims, BertLayerWeights,
                                      DepthPlan, EncryptedBertModel,
                                      galois_steps_for_model,
                                      calibrate_domains, plain_bert_layer)

    ap = argparse.ArgumentParser()
    ap.add_argument("--hf-dir", default=None)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--inputs", type=int, default=8)
    ap.add_argument("--logN", type=int, default=11)
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    if args.hf_dir:
        dims = BertDims(num_x=128, num_row=8, d_model=768, num_heads=12,
                        head_dim=64, d_inter=3072)
        weights = load_hf_weights(args.hf_dir, dims, args.layers)
    else:
        dims = BertDims(num_x=1 << (args.logN - 1 - 3), num_row=8,
                        d_model=16, num_heads=2, head_dim=8, d_inter=32)
        d, hh, di = dims.d_model, dims.num_heads * dims.head_dim, \
            dims.d_inter
        g = lambda *s: rng.normal(0, 0.22, s)
        weights = [BertLayerWeights(
            wq=g(d, hh), bq=g(hh) * 0.1, wk=g(d, hh), bk=g(hh) * 0.1,
            wv=g(d, hh), bv=g(hh) * 0.1, wo=g(d, d) * 0.4, bo=g(d) * 0.1,
            ln1_g=rng.uniform(0.8, 1.2, d), ln1_b=g(d) * 0.1,
            wi=g(d, di) * 0.4, bi=g(di) * 0.1, wf=g(di, d) * 0.4,
            bf=g(d) * 0.1, ln2_g=rng.uniform(0.8, 1.2, d),
            ln2_b=g(d) * 0.1) for _ in range(args.layers)]

    n_inputs = min(args.inputs, dims.num_x)
    lens = np.full(n_inputs, dims.num_row)
    xs = rng.normal(0, 0.6, (n_inputs, dims.num_row, dims.d_model))

    # plaintext pipeline + a linear probe classifier on [CLS] features
    def plain_forward(x):
        for w in weights:
            x = plain_bert_layer(x, w, dims)
        return x

    # probe classifier trained on HELD-OUT plaintext inputs (disjoint from
    # the eval batch — training on the eval inputs would interpolate them
    # exactly and make agreement vacuous), then both pipelines are scored
    # on the fresh eval inputs only.
    n_train = 32
    xs_train = rng.normal(0, 0.6, (n_train, dims.num_row, dims.d_model))
    train_feats = np.stack([plain_forward(xs_train[j])[0]
                            for j in range(n_train)])
    labels = rng.integers(0, 2, n_train)
    Y = np.eye(2)[labels]
    Wc, *_ = np.linalg.lstsq(
        np.concatenate([train_feats, np.ones((n_train, 1))], 1), Y,
        rcond=None)
    clf = lambda f: (np.concatenate([f, np.ones(1)]) @ Wc).argmax()
    feats = np.stack([plain_forward(xs[j])[0] for j in range(n_inputs)])
    plain_dec = np.array([clf(f) for f in feats])

    # encrypted pipeline
    cfg = CKKSConfig(logN=args.logN, q0_bits=(30.0, 30.0),
                     data_pair_bits=26.0, n_data_levels=13,
                     n_boot_levels=0, dnum=2, hamming_weight=64)
    ctx = make_context(cfg)
    assert dims.num_x * dims.num_row == ctx.cfg.slots
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=31)
    gks = kg.gen_galois_keys(steps=galois_steps_for_model(dims))
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)
    rec = Recryptor(encryptor, decryptor)
    plan = DepthPlan(exp_r=5, inv_iters=5, ln_newton=2, ln_gold=0,
                     gelu_degree=16)
    domains, max_table = calibrate_domains(xs, lens, weights, dims)
    model = EncryptedBertModel(
        ev, enc, weights, dims, plan, lens,
        refresh=lambda ct, n_q: rec.recrypt(ct, n_q=n_q),
        max_table=max_table, domains=domains)
    x_ct = batch_input(encryptor, xs, dims.num_x, dims.num_row,
                       n_q=model.n_att)
    out = model(x_ct)
    got_slots = decryptor.decrypt(out).real
    got = unpack_batch(got_slots, dims.num_x, dims.num_row, n_inputs)
    enc_dec = np.array([clf(got[j, 0]) for j in range(n_inputs)])

    match = int((enc_dec == plain_dec).sum())
    print(json.dumps({
        "task": "synthetic-probe" if not args.hf_dir else "hf-local",
        "layers": args.layers, "n": n_inputs, "match": match,
        "mismatch": n_inputs - match,
        "agreement": round(match / n_inputs, 4),
        "feature_max_err": round(float(np.max([np.abs(
            got[j, :dims.num_row] - plain_forward(xs[j])).max()
            for j in range(n_inputs)])), 4),
    }))


if __name__ == "__main__":
    main()
