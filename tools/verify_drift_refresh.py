"""Drive the drifted-scale refresh fix end-to-end (the r4/r5 layer-test
refresh-#2 divergence, root-caused from the dumped failing ciphertext:
the attention chain's compounded squaring drift delivered the W_O output
at tracked scale 2^25 instead of 2^52; |m|*scale/q0 then sits below the
EvalMod resolution and the alpha fold amplifies the fit error to ~3.6e4).

Emulates the exact condition: a batch of 8 ciphertexts whose message
rides at scale ~2^25 (27 bits below canonical), held at q0+1 level, then
refreshed through make_refresh — which now re-lands the scale at
ctx.scale (one match_scale level) before bootstrapping.

Run: python tools/verify_drift_refresh.py
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

M_BOUND = 3.5      # the failing layer run's calibrated bound


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

    rng = np.random.default_rng(5)
    v = rng.normal(0, 0.02, (8, ctx.cfg.slots))
    drift = 2.0 ** -27                      # the measured drift factor
    ct = encryptor.encrypt_values(v * drift, n_q=ctx.n_q0 + 2)
    ct = ev.with_scale(ct, ct.scale * drift,
                       reason="emulate compounded squaring drift")
    print(f"[drift] in scale {ct.scale:.4g} (canonical {ctx.scale:.4g}) "
          f"n_q={ct.n_q}", flush=True)
    out = refresh(ct, ctx.n_q0 + 4)
    got = dec.decrypt(out).real
    err = float(np.abs(got - v).max())
    print(f"[drift] refresh err={err:.4g} out scale {out.scale:.6g} "
          f"n_q={out.n_q}", flush=True)
    assert err < 2e-2, err
    print("[drift] OK — drifted-scale refresh re-lands and bootstraps "
          "correctly", flush=True)


if __name__ == "__main__":
    main()
