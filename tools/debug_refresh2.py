"""Minimal repro of the test_bert_layer_real_bootstrap refresh #2
divergence: bootstrap of a CPMM-produced, batched, tiny-message q0-level
ciphertext.  Discriminates the suspects (TESTRUNS.md open item 3):

  A  fresh-encrypted BATCH of 8 columns, tiny values (~0.055), n_q=4,
     refresh drops to q0 -> boot           [batched + tiny + mod_drop]
  B  same but a SINGLE ciphertext          [tiny + mod_drop]
  C  CPMM output at n_q=2 (rescale path, bias+mask, batched)
                                           [the exact refresh #2 shape]
  D  fresh batch, wide values (+-6)        [batched control]

Run: JAX_PLATFORMS=cpu python tools/debug_refresh2.py
"""

import _env  # noqa: F401

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from moai_tpu.params import CKKSConfig, make_context  # noqa: E402
from moai_tpu.encoder import Encoder  # noqa: E402
from moai_tpu.keys import KeyGenerator  # noqa: E402
from moai_tpu.encrypt import Encryptor, Decryptor  # noqa: E402
from moai_tpu.evaluator import Evaluator  # noqa: E402
from moai_tpu.boot.bootstrap import Bootstrapper, make_refresh  # noqa: E402
from moai_tpu.ops.matmul import CPMM  # noqa: E402

M_BOUND = 8.0


def main():
    cfg = CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=27, n_boot_levels=0, dnum=7,
                     special_bits=29.5, hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=404)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    dec = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc, m_bound=M_BOUND)
    ev.galois_keys = kg.gen_galois_keys(steps=bt.galois_steps(),
                                        conjugate=True)
    refresh = make_refresh(bt, m_bound=M_BOUND)
    rng = np.random.default_rng(11)
    slots = ctx.cfg.slots

    def check(tag, ct, want):
        got = dec.decrypt(refresh(ct, ctx.n_q0 + 4)).real
        err = float(np.abs(got - want).max())
        print(f"[{tag}] in|max|={np.abs(want).max():.4f} "
              f"boot_err={err:.4g} n_q_in={ct.n_q} scale_in={ct.scale:.6g} "
              f"shape={ct.data.shape}", flush=True)
        return err

    # C: CPMM-produced at q0 (the refresh #2 shape): encrypt batch of 8
    # columns at n_q=4, multiply by an 8x8 weight with bias+mask.
    # Runs FIRST: it shares case A's batched shapes, so after one A run
    # populated the compile cache this is the cheapest discriminator.
    W = rng.normal(0, 0.25, (8, 8)) * 0.15
    bias = rng.normal(0, 0.025, 8)
    mask = (rng.uniform(size=slots) < 0.9).astype(np.float64)
    xC = rng.normal(0, 0.1, (8, slots))
    ctx_in = encryptor.encrypt_values(xC, n_q=ctx.n_q0 + 2)
    mm = CPMM(ev, enc, W, ctx.n_q0 + 2, bias=bias, mask=mask)
    ctC = mm(ctx_in)
    wantC = (W.T @ xC) * mask[None, :] + bias[:, None] * mask[None, :]
    gotC = dec.decrypt(ctC).real
    print(f"[C] cpmm decrypt err (pre-boot): "
          f"{float(np.abs(gotC - wantC).max()):.4g} n_q={ctC.n_q} "
          f"scale={ctC.scale:.6g}", flush=True)
    check("C batched CPMM->q0     ", ctC, wantC)

    # C2: same but with a DRIFTED scale (the attention chain's composite-
    # pair drift): reinterpret the input at a scale 1.7x off ctx.scale by
    # encrypting values pre-multiplied by the drift factor
    drift = 1.7
    ctx_in2 = encryptor.encrypt_values(xC * drift, n_q=ctx.n_q0 + 2)
    ctx_in2 = ev.with_scale(ctx_in2, ctx_in2.scale * drift,
                            reason="debug: emulate composite scale drift")
    ctC2 = mm(ctx_in2)
    gotC2 = dec.decrypt(ctC2).real
    print(f"[C2] drifted-scale cpmm decrypt err (pre-boot): "
          f"{float(np.abs(gotC2 - wantC).max()):.4g} scale={ctC2.scale:.6g}",
          flush=True)
    check("C2 drifted-scale CPMM  ", ctC2, wantC)

    # D: batched wide fresh
    vD = rng.uniform(-6, 6, (8, slots))
    ctD = encryptor.encrypt_values(vD, n_q=ctx.n_q0 + 2)
    check("D batched wide fresh@4", ctD, vD)

    # A: batched tiny fresh (baseline; passed in the first recorded run)
    vA = rng.normal(0, 0.02, (8, slots))
    ctA = encryptor.encrypt_values(vA, n_q=ctx.n_q0 + 2)
    check("A batched tiny fresh@4", ctA, vA)

    # B: single tiny fresh
    vB = vA[0]
    ctB = encryptor.encrypt_values(vB, n_q=ctx.n_q0 + 2)
    check("B single  tiny fresh@4", ctB, vB)


if __name__ == "__main__":
    main()
