"""Stage-by-stage bootstrap diagnosis with harness-side decrypt oracles
(the reference does this with decrypts inside op code, softmax.hpp:472;
here it is an external tool).  Run: python tools/debug_boot.py"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from moai_tpu.params import CKKSConfig, make_context  # noqa: E402
from moai_tpu.encoder import Encoder  # noqa: E402
from moai_tpu.keys import KeyGenerator  # noqa: E402
from moai_tpu.encrypt import Encryptor, Decryptor  # noqa: E402
from moai_tpu.evaluator import Evaluator  # noqa: E402
from moai_tpu.boot.bootstrap import Bootstrapper  # noqa: E402
from moai_tpu.boot.linear import apply_diagonals  # noqa: E402
from moai_tpu import mod_arith as ma  # noqa: E402


def crt_compose_centered(res, qs):
    """residues [n_q, N] -> centered big-int coefficients (object array)."""
    Q = 1
    for q in qs:
        Q *= q
    acc = np.zeros(res.shape[-1], dtype=object)
    for i, q in enumerate(qs):
        hat = Q // q
        hati = pow(hat % q, -1, q)
        lam = (res[i].astype(object) * hati) % q
        acc += lam * hat
    acc %= Q
    acc[acc > Q // 2] -= Q
    return acc


def main():
    cfg = CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=13, n_boot_levels=0, dnum=7,
                     special_bits=29.5, hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=101)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    dec = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc)
    ev.galois_keys = kg.gen_galois_keys(steps=bt.galois_steps(),
                                        conjugate=True)

    rng = np.random.default_rng(77)
    v = rng.uniform(-0.8, 0.8, ctx.cfg.slots)
    ct = encryptor.encrypt_values(v, n_q=ctx.n_q0)
    n = enc.slots

    # stage 0: true bottom coefficients
    r_bot = dec.decrypt_to_residues(ct)
    q0s = ctx.q_primes[: ctx.n_q0]
    v_true = crt_compose_centered(r_bot, q0s)      # centered mod q0
    print("stage0 |v|max/q0:", float(np.abs(v_true).max()) / ctx.q0_product)

    raised = bt.modraise(ct)
    r_full = dec.decrypt_to_residues(raised)
    v_raised = crt_compose_centered(r_full, ctx.q_primes[: ctx.L])
    I = (v_raised - v_true) // ctx.q0_product
    rem = (v_raised - v_true) % ctx.q0_product
    print("stage1 modraise: rem==0:", bool((rem == 0).all()),
          " |I|max:", int(np.abs(I).max()))

    z = raised
    for lev in bt.c2s_levels:
        z = apply_diagonals(ev, enc, z, lev)
    zt = ev.with_scale(z, bt.q0, reason="debug: ModRaise reinterpretation")
    got_t = dec.decrypt(zt)
    # expected (up to the factored path's bit-reversal permutation)
    v_f = v_raised.astype(np.float64)
    u = (v_f[:n] + 1j * v_f[n:]) / ctx.q0_product
    gs = np.sort_complex(got_t)
    us = np.sort_complex(u)
    print("stage2 c2s (sorted cmp) err:",
          float(np.abs(np.sort(got_t.real) - np.sort(u.real)).max()))

    tc = ev.conjugate(zt)
    q = ev.dev["q"][: zt.n_q].reshape(-1, 1)
    t_r = zt.with_data(ma.add_mod(zt.data, tc.data, q))
    y_r = bt.mr(ev, t_r, pre_scale=0.5)
    got_y = dec.decrypt(y_r).real
    want_y = np.sin(2 * np.pi * got_t.real)
    print("stage3 evalmod err vs sin(2pi t):",
          float(np.abs(got_y - want_y).max()))

    out = bt(ct)
    got = dec.decrypt(out)
    print("stage4 full: real err:", float(np.abs(got.real - v).max()),
          " imag:", float(np.abs(got.imag).max()),
          " n_q:", out.n_q, " scale:", out.scale)


if __name__ == "__main__":
    main()
