"""End-to-end drive of the round-5 changes through the package surface
(.claude/skills/verify recipe):

1. bootstrap on a MIXED chain (26-bit data pairs + 29-bit boot pairs) —
   exercises the EvalMod work_scale fix (the flagship_n16 boot-pair
   numerics bug) at logN=9 on CPU;
2. vmapped multi-head EncryptedAttention (H=2) vs a numpy oracle —
   exercises the head-batching restructure with a harness Recryptor.

Run: python tools/verify_drive.py [boot|attn]
"""

import _env  # noqa: F401

import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from moai_tpu.params import CKKSConfig, make_context  # noqa: E402
from moai_tpu.encoder import Encoder  # noqa: E402
from moai_tpu.keys import KeyGenerator  # noqa: E402
from moai_tpu.encrypt import Encryptor, Decryptor  # noqa: E402
from moai_tpu.evaluator import Evaluator  # noqa: E402


def drive_boot_pairs():
    from moai_tpu.boot.bootstrap import Bootstrapper
    cfg = CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=2, boot_pair_bits=29.0, n_boot_levels=14,
                     dnum=7, special_bits=29.5, hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=21)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    dec = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc)
    assert bt.levels <= cfg.n_boot_levels, (bt.levels, cfg.n_boot_levels)
    ev.galois_keys = kg.gen_galois_keys(steps=bt.galois_steps(),
                                        conjugate=True)
    rng = np.random.default_rng(31)
    v = rng.uniform(-0.8, 0.8, ctx.cfg.slots)
    ct = encryptor.encrypt_values(v, n_q=ctx.n_q0)
    out = bt(ct)
    got = dec.decrypt(out)
    err = float(np.abs(got.real - v).max())
    print(f"[boot-pairs] err={err:.3g} out_n_q={out.n_q} "
          f"(boot region 29-bit pairs, data region 26-bit)", flush=True)
    assert err < 2e-2, err
    print("[boot-pairs] OK", flush=True)


def drive_vmapped_attention():
    from scipy.special import erf  # noqa: F401  (parity w/ tests)
    from moai_tpu.utils.recrypt import Recryptor
    from moai_tpu.ops.packing import batch_input, unpack_batch
    from moai_tpu.models.bert import (BertDims, BertLayerWeights, DepthPlan,
                                      EncryptedAttention,
                                      galois_steps_for_model)

    dims = BertDims(num_x=32, num_row=8, d_model=8, num_heads=2, head_dim=4,
                    d_inter=8)
    plan = DepthPlan(exp_r=3, inv_iters=3, ln_newton=1, ln_gold=0,
                     gelu_degree=8)
    att_in = plan.attention_in
    n_att = 2 + 2 * att_in + 2
    cfg = CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=(n_att - 2) // 2 + 6, n_boot_levels=0,
                     dnum=4, hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=77)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    dec = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    ev.galois_keys = kg.gen_galois_keys(steps=galois_steps_for_model(dims),
                                        conjugate=True)
    rc = Recryptor(encryptor, dec)

    rng = np.random.default_rng(3)
    d, hh = dims.d_model, dims.num_heads * dims.head_dim
    g = lambda *s: rng.normal(0, 0.3, s)
    w = BertLayerWeights(
        wq=g(d, hh), bq=g(hh) * 0.1, wk=g(d, hh), bk=g(hh) * 0.1,
        wv=g(d, hh), bv=g(hh) * 0.1, wo=np.eye(d), bo=np.zeros(d),
        ln1_g=np.ones(d), ln1_b=np.zeros(d), wi=g(d, dims.d_inter),
        bi=np.zeros(dims.d_inter), wf=g(dims.d_inter, d), bf=np.zeros(d),
        ln2_g=np.ones(d), ln2_b=np.zeros(d))

    n_inputs = 2
    lens = np.array([8, 5])
    xs = rng.normal(0, 0.5, (n_inputs, dims.num_row, d))
    for j, ln_ in enumerate(lens):
        xs[j, ln_:] = 0.0

    def oracle(x):
        hd, H = dims.head_dim, dims.num_heads
        q = x @ w.wq / np.sqrt(hd) + w.bq / np.sqrt(hd)
        k = x @ w.wk + w.bk
        v = x @ w.wv + w.bv
        outs = []
        for h in range(H):
            sl = slice(h * hd, (h + 1) * hd)
            sc = q[:, sl] @ k[:, sl].T
            e = np.exp(sc - sc.max())
            outs.append(e / e.sum(-1, keepdims=True) @ v[:, sl])
        return np.concatenate(outs, axis=-1)

    want = [oracle(xs[j, :lens[j]]) for j in range(n_inputs)]
    qmax = 0.0
    for j in range(n_inputs):
        x = xs[j, :lens[j]]
        q = x @ w.wq / np.sqrt(dims.head_dim) + w.bq / np.sqrt(dims.head_dim)
        k = x @ w.wk + w.bk
        for h in range(dims.num_heads):
            sl = slice(h * dims.head_dim, (h + 1) * dims.head_dim)
            qmax = max(qmax, float(np.abs(q[:, sl] @ k[:, sl].T).max()))

    attn = EncryptedAttention(
        ev, enc, w, dims, plan, n_att, lens, max_table=qmax,
        refresh=lambda ct, n_q: rc.recrypt(ct, n_q=n_q, scale=ct.scale))
    x_ct = batch_input(encryptor, xs, dims.num_x, dims.num_row, n_q=n_att)
    out = attn(x_ct)
    got_slots = dec.decrypt(out).real
    got = unpack_batch(got_slots, dims.num_x, dims.num_row, n_inputs)
    errs = [float(np.abs(got[j, :lens[j]] - want[j]).max())
            for j in range(n_inputs)]
    print(f"[vmap-attn H=2] errs={errs}", flush=True)
    assert max(errs) < 0.05, errs
    print("[vmap-attn] OK", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("boot", "all"):
        drive_boot_pairs()
    if which in ("attn", "all"):
        drive_vmapped_attention()
