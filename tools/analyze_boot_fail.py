"""Offline stage-by-stage diagnosis of a bootstrap divergence dumped by
tests/test_model_boot.py (the refresh probe saves the failing input ct to
/tmp/boot_fail_rN_in.npz together with the secret key).

Walks the exact make_refresh -> Bootstrapper pipeline with decrypt
oracles after every stage (the reference's in-op debug decrypts,
softmax.hpp:472, as an external tool):

  stage 0: bottom-level residues, message magnitude
  stage 1: ModRaise — exact-remainder check + I histogram vs K
  stage 2: CoeffToSlot — slot values vs the raised coefficients
  stage 3: EvalMod inputs t_r/t_i — distance from integers vs eps
  stage 4: EvalMod outputs vs sin(2*pi*t)
  stage 5: full output vs the input message

Usage: python tools/analyze_boot_fail.py /tmp/boot_fail_r2_in.npz \
          --seed 404 --m-bound 8.0
"""

import _env  # noqa: F401

import argparse

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from moai_tpu.params import make_context  # noqa: E402
from moai_tpu.encoder import Encoder  # noqa: E402
from moai_tpu.keys import KeyGenerator  # noqa: E402
from moai_tpu.encrypt import Decryptor  # noqa: E402
from moai_tpu.evaluator import Evaluator  # noqa: E402
from moai_tpu.boot.bootstrap import Bootstrapper  # noqa: E402
from moai_tpu.boot.linear import apply_diagonals  # noqa: E402
from moai_tpu import mod_arith as ma  # noqa: E402
from moai_tpu.serial import _load  # noqa: E402
from moai_tpu.ciphertext import Ciphertext  # noqa: E402


def crt_compose_centered(res, qs):
    Q = 1
    for q in qs:
        Q *= q
    acc = np.zeros(res.shape[:-2] + (res.shape[-1],), dtype=object)
    for i, q in enumerate(qs):
        hat = Q // q
        hati = pow(hat % q, -1, q)
        lam = (res[..., i, :].astype(object) * hati) % q
        acc += lam * hat
    acc %= Q
    acc[acc > Q // 2] -= Q
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ct_path")
    ap.add_argument("--seed", type=int, default=404)
    ap.add_argument("--m-bound", type=float, default=8.0)
    args = ap.parse_args()

    h, arrays = _load(args.ct_path)
    from moai_tpu.serial import _cfg_from_dict
    cfg = _cfg_from_dict(h["config"])
    ct = Ciphertext(np.asarray(arrays["data"]), float(h["scale"]),
                    bool(h["is_ntt"]))
    print(f"[load] shape={ct.data.shape} n_q={ct.n_q} scale={ct.scale:.6g}"
          f" cfg logN={cfg.logN} L_primes=?")

    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=args.seed)
    dec = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc, m_bound=args.m_bound)
    ev.galois_keys = kg.gen_galois_keys(steps=bt.galois_steps(),
                                        conjugate=True)

    import jax.numpy as jnp
    ct = ct.with_data(jnp.asarray(ct.data))
    m0 = dec.decrypt(ct)
    print(f"[s0] |m| max={np.abs(m0.real).max():.4f} "
          f"imag={np.abs(m0.imag).max():.2e}")

    x = ev.mod_drop_to(ct, ctx.n_q0)
    x = ev.with_scale(x, x.scale * args.m_bound, reason="analyze")
    delta_in = x.scale
    q0s = ctx.q_primes[: ctx.n_q0]
    r_bot = dec.decrypt_to_residues(x)
    v_true = crt_compose_centered(np.asarray(r_bot), q0s)
    vmax = float(np.abs(v_true.astype(np.float64)).max())
    print(f"[s0] |coeff|max/q0 = {vmax / ctx.q0_product:.4e} "
          f"(= m*Delta/q0; eps envelope {bt.mr.eps:.4e} K={bt.mr.K} "
          f"arcsin_deg={bt.mr.arcsin_deg})")

    raised = bt.modraise(x)
    r_full = dec.decrypt_to_residues(raised)
    v_raised = crt_compose_centered(np.asarray(r_full),
                                    ctx.q_primes[: ctx.L])
    dd = v_raised - v_true
    rem = dd % ctx.q0_product
    I = dd // ctx.q0_product
    Iabs = np.abs(I.astype(np.float64))
    print(f"[s1] modraise rem==0: {bool((rem == 0).all())}  |I|max:"
          f" {int(Iabs.max())}  P(|I|>K): "
          f"{(Iabs > bt.mr.K).mean():.3e}")

    z = raised
    for lev in bt.c2s_levels:
        z = apply_diagonals(ev, enc, z, lev)
    t = ev.with_scale(z, bt.q0 * z.scale / delta_in, reason="analyze")
    got_t = dec.decrypt(t)
    n = enc.slots
    v_f = v_raised.astype(np.float64) / float(delta_in)
    want_t = (v_f[..., :n] + 1j * v_f[..., n:])
    e2 = float(np.abs(np.sort_complex(got_t.reshape(-1))
                      - np.sort_complex(want_t.reshape(-1))).max())
    print(f"[s2] c2s sorted-set err: {e2:.3e} "
          f"(t decodes m*Delta/q0 + I at scale q0*z/delta)")

    tc = ev.conjugate(t)
    qv = ev.dev["q"][: t.n_q].reshape(-1, 1)
    t_r = t.with_data(ma.add_mod(t.data, tc.data, qv))
    t_i = bt.mul_i(t.with_data(ma.sub_mod(tc.data, t.data, qv)))
    for name, tt in (("t_r", t_r), ("t_i", t_i)):
        vals = dec.decrypt(tt).real * 0.5          # pre_scale fold
        fra = np.abs(vals - np.round(vals))
        print(f"[s3] {name}: |val|max={np.abs(vals).max():.3f} "
              f"frac-dist max={fra.max():.4e} (eps {bt.mr.eps:.4e})")

    ws = ev.level_pair_scale(t_r.n_q)
    y_r = bt.mr(ev, t_r, pre_scale=0.5, work_scale=ws)
    got_y = dec.decrypt(y_r).real
    tv = dec.decrypt(t_r).real * 0.5
    want_y = np.sin(2 * np.pi * tv)
    print(f"[s4] evalmod(t_r) err vs sin: "
          f"{float(np.abs(got_y - want_y).max()):.4e} "
          f"y scale={y_r.scale:.6g} n_q={y_r.n_q}")

    out = bt(ct.with_data(x.data) if False else x)
    got = dec.decrypt(out).real / args.m_bound
    err = float(np.abs(got - m0.real).max())
    print(f"[s5] full refresh err vs input: {err:.4e} "
          f"out n_q={out.n_q} scale={out.scale:.6g}")


if __name__ == "__main__":
    main()
