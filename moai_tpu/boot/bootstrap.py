"""CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod x2 -> SlotToCoeff.

TPU-native counterpart of the reference Bootstrapper (reference:
include/source/bootstrapping/Bootstrapper.cpp — bootstrap_full_3 :3231:
modraise_inplace :2938, coefftoslot_full_3 :2742, 2x modular_reduction
:3244, slottocoeff_full_3 :2760).  Differences:

- ModRaise composes the n_q0 bottom limbs on-device with a float32
  CRT-quotient estimate (exactness up to +-1 multiple of q0, absorbed by
  EvalMod's +-K range), instead of SEAL's 64-bit centered lift loop.
- CoeffToSlot/SlotToCoeff are single dense BSGS levels built from the
  closed-form embedding inverse A^H/n (boot/linear.py) — 1 level each
  instead of the reference's 3 — with the q0/(2*pi*Delta) and output
  scale folded into the SlotToCoeff diagonals (the reference folds the
  same constants in sfl_full_3, Bootstrapper.cpp:2481-2494).
- Multiplication by i is a free negacyclic monomial multiply (X^n),
  not a keyed operation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import mod_arith as ma
from ..ciphertext import Ciphertext, Plaintext
from ..evaluator import Evaluator
from ..encoder import Encoder
from ..ntt import ntt, intt
from .linear import (apply_diagonals, matrix_diagonals, bsgs_steps,
                     c2s_matrix, s2c_matrix, c2s_apply_levels,
                     s2c_apply_levels, group_apply_levels)
from .evalmod import ModReducer


class Bootstrapper:
    def __init__(self, ev: Evaluator, encoder: Encoder,
                 mod_reducer: ModReducer | None = None,
                 m_bound: float = 1.0, n_out: int | None = None,
                 lt_group: int | None = None,
                 arcsin_deg: int | None = None):
        """``lt_group``: 0 = dense single-level CoeffToSlot/SlotToCoeff
        (1 level each, n diagonal plaintexts — test scale only); k>0 =
        radix-factored levels grouped k butterflies per level (memory
        ~2^k diagonals per level; the reference's 3-level split
        corresponds to k = ceil(log2 n / 3)).  Default: dense for
        n <= 512, else 3 grouped levels."""
        self.ev, self.encoder = ev, encoder
        ctx = ev.ctx
        self.ctx = ctx
        self.q0 = float(ctx.q0_product)
        eps = m_bound * ctx.scale / self.q0
        if arcsin_deg is None:
            # wide physical intervals (|m| >> 1) leave an O(eps^3) residual
            # from the linearized arcsin — switch on the cubic correction
            arcsin_deg = 3 if eps > 2.0 ** -7 else 1
        self.mr = mod_reducer if mod_reducer is not None else \
            ModReducer(K=25, eps=max(eps, 2.0 ** -10),
                       arcsin_deg=arcsin_deg)
        n = encoder.slots
        logn = n.bit_length() - 1
        if lt_group is None:
            lt_group = 0 if n <= 512 else -(-logn // 3)
        self.lt_group = lt_group
        if lt_group == 0:
            self.c2s_levels = [matrix_diagonals(c2s_matrix(encoder))]
            self.s2c_levels = [matrix_diagonals(s2c_matrix(encoder))]
        else:
            self.c2s_levels = group_apply_levels(c2s_apply_levels(encoder),
                                                 lt_group)
            self.s2c_levels = group_apply_levels(s2c_apply_levels(encoder),
                                                 lt_group)
        self._build_modraise_tables()
        self._imono = None
        self.n_out = n_out
        # LT plaintexts-as-arguments machinery (keys-as-data for jit):
        # _lt_mode is None (encode inline as trace constants), "collect"
        # (encode + record, under jax.eval_shape), or "use" (consume the
        # pytree passed to __call__ in the same deterministic order).
        self._lt_mode = None
        self._lt_store: list = []
        self._lt_scales: list = []
        self._lt_iter = 0

    # -- key planning ------------------------------------------------------
    def galois_steps(self) -> list[int]:
        n = self.encoder.slots
        steps: set[int] = set()
        for lev in self.c2s_levels + self.s2c_levels:
            steps |= set(bsgs_steps(sorted(lev.keys()), n))
        return sorted(steps)

    @property
    def levels(self) -> int:
        """Composite levels consumed: c2s + evalmod + s2c."""
        return len(self.c2s_levels) + self.mr.levels + len(self.s2c_levels)

    # -- ModRaise ----------------------------------------------------------
    def _build_modraise_tables(self):
        ctx = self.ctx
        n0, L = ctx.n_q0, ctx.L
        primes = ctx.q_primes
        q0 = ctx.q0_product
        hatinv = np.empty(n0, np.uint32)
        hat_mm = np.empty((n0, L), np.uint32)
        q0_mm = np.empty(L, np.uint32)
        for i in range(n0):
            qi = primes[i]
            hat = q0 // qi
            hatinv[i] = pow(hat % qi, -1, qi) * (1 << 32) % qi
            for j in range(L):
                qj = primes[j]
                hat_mm[i, j] = (hat % qj) * pow(2, 64, qj) % qj
        for j in range(L):
            qj = primes[j]
            q0_mm[j] = (q0 % qj) * pow(2, 64, qj) % qj
        self._mr_hatinv = jnp.asarray(hatinv).reshape(-1, 1)
        self._mr_hat_mm = jnp.asarray(hat_mm)
        self._mr_q0_mm = jnp.asarray(q0_mm)
        self._mr_qinv_f = jnp.asarray(
            np.array([1.0 / primes[i] for i in range(n0)], np.float32)
        ).reshape(-1, 1)

    def modraise(self, ct: Ciphertext) -> Ciphertext:
        """ct at the bottom n_q0 primes -> full chain; message becomes
        m*Delta + q0*I (reference: modraise_inplace,
        Bootstrapper.cpp:2938)."""
        ev, ctx = self.ev, self.ctx
        n0, L = ctx.n_q0, ctx.L
        assert ct.n_q == n0
        dv = ev.dev
        q0v = dv["q"][:n0].reshape(-1, 1)
        qneg0 = dv["qneg_inv"][:n0].reshape(-1, 1)
        c = intt(ct.data, ev.tbd, limb_slice=(0, n0))
        lam = ma.from_mont(ma.mont_mul(c, self._mr_hatinv, q0v, qneg0),
                           q0v, qneg0)                     # true, [..,P,n0,N]
        f = jnp.sum(lam.astype(jnp.float32) * self._mr_qinv_f, axis=-2)
        k = jnp.round(f).astype(jnp.uint32)                # [..., P, N]
        qL = dv["q"][:L].reshape(-1, 1)
        qnegL = dv["qneg_inv"][:L].reshape(-1, 1)
        acc = None
        for i in range(n0):
            hat = self._mr_hat_mm[i].reshape(-1, 1)        # [L, 1]
            term = ma.mont_mul(lam[..., i:i + 1, :], hat, qL, qnegL)
            acc = term if acc is None else ma.add_mod(acc, term, qL)
        kq0 = ma.mont_mul(k[..., None, :], self._mr_q0_mm.reshape(-1, 1),
                          qL, qnegL)
        acc = ma.sub_mod(acc, kq0, qL)
        out = ntt(acc, ev.tbd, limb_slice=(0, L))
        return Ciphertext(out, ct.scale, True)

    # -- multiply by i (free monomial X^n) ---------------------------------
    def _i_mono(self, n_q: int) -> jnp.ndarray:
        if self._imono is None or self._imono.shape[0] < self.ctx.L:
            import jax
            N = self.ctx.cfg.N
            coeffs = np.zeros((self.ctx.L, N), np.uint32)
            for j, qj in enumerate(self.ctx.q_primes):
                coeffs[j, N // 2] = (1 << 32) % qj         # Montgomery 1
            # concrete even when first touched under a trace (the cached
            # value must never be a tracer — collect_lt traces this path);
            # jnp NTT (Pallas stripped): one-time setup, and the Pallas
            # kernel cannot trace under the eval_shape collection pass
            tbd = {k: v for k, v in self.ev.tbd.items() if k != "pallas"}
            with jax.ensure_compile_time_eval():
                self._imono = ntt(jnp.asarray(coeffs), tbd,
                                  limb_slice=(0, self.ctx.L))
        return self._imono[:n_q]

    def mul_i(self, ct: Ciphertext) -> Ciphertext:
        """Multiply all slots by i = X^(N/2): exact, free (no key switch,
        no level, no scale change)."""
        ev = self.ev
        q = ev.dev["q"][:ct.n_q].reshape(-1, 1)
        qneg = ev.dev["qneg_inv"][:ct.n_q].reshape(-1, 1)
        return ct.with_data(ma.mont_mul(ct.data, self._i_mono(ct.n_q),
                                        q, qneg))

    # -- LT plaintexts as jit arguments ----------------------------------
    def _pt_source(self, lt):
        """Return a pt_source callable for apply_diagonals matching the
        current mode, or None for inline encoding."""
        from .linear import _encode_pt

        if self._lt_mode == "collect":
            import jax

            def src(vec, scale, n_q):
                # concrete even under the eval_shape collection trace —
                # the stored plaintexts become jit ARGUMENTS later
                with jax.ensure_compile_time_eval():
                    pt = _encode_pt(self.ev, self.encoder, vec, scale, n_q)
                self._lt_store.append(pt.data)
                self._lt_scales.append((float(scale), n_q))
                return pt
            return src
        if self._lt_mode == "use":
            def src(vec, scale, n_q):
                i = self._lt_iter
                self._lt_iter += 1
                s_rec, nq_rec = self._lt_scales[i]
                assert nq_rec == n_q, (i, nq_rec, n_q)
                return Plaintext(data=lt[i], scale=s_rec)
            return src
        return None

    def collect_lt(self, ct_scale: float | None = None,
                   n_polys: int = 2) -> list:
        """Pre-encode every CoeffToSlot/SlotToCoeff diagonal plaintext by
        abstractly tracing the pipeline (jax.eval_shape: no device
        compute, no compiled constants).  Returns the plaintext pytree to
        pass back as ``lt=`` — keeping ~100s of MB of key/plaintext data
        out of the compiled HLO body (required for remote-compile
        endpoints with bounded request size, and good for cache keys)."""
        import jax
        ctx = self.ctx
        scale = ct_scale if ct_scale is not None else ctx.scale
        self._lt_mode = "collect"
        self._lt_store, self._lt_scales = [], []
        try:
            jax.eval_shape(
                lambda d: self(Ciphertext(d, scale, True)).data,
                jax.ShapeDtypeStruct((n_polys, ctx.n_q0, ctx.cfg.N),
                                     jnp.uint32))
        finally:
            self._lt_mode = None
        return list(self._lt_store)

    # -- full pipeline ------------------------------------------------------
    def __call__(self, ct: Ciphertext, lt: list | None = None) -> Ciphertext:
        ev, enc, ctx = self.ev, self.encoder, self.ctx
        if lt is not None:
            self._lt_mode = "use"
            self._lt_iter = 0
            try:
                return self._run(ct, lt)
            finally:
                self._lt_mode = None
        return self._run(ct, lt)

    def _run(self, ct: Ciphertext, lt) -> Ciphertext:
        ev, enc, ctx = self.ev, self.encoder, self.ctx
        src = self._pt_source(lt)
        delta_in = ct.scale
        raised = self.modraise(ct)
        z = raised
        for lev in self.c2s_levels:
            z = apply_diagonals(ev, enc, z, lev, pt_source=src)
        # reinterpret: slots now hold t = m*Delta_in/q0 + I at scale q0
        # (coefficients arrive bit-reversed in the factored path; EvalMod
        # is pointwise and SlotToCoeff consumes the same order, so the
        # permutation cancels)
        t = ev.with_scale(z, self.q0 * z.scale / delta_in,
                          reason="ModRaise: slots hold m*Delta/q0 + I")
        tc = ev.conjugate(t)
        q = ev.dev["q"][:t.n_q].reshape(-1, 1)
        t_r = t.with_data(ma.add_mod(t.data, tc.data, q))     # 2*Re(t)
        t_i = self.mul_i(t.with_data(ma.sub_mod(tc.data, t.data, q)))  # 2*Im
        y_r = self.mr(ev, t_r, pre_scale=0.5)
        y_i = self.mr(ev, t_i, pre_scale=0.5)
        w = ev.add(y_r, self.mul_i(y_i))
        # fold q0/(2*pi*Delta_in) and the output scale into the LAST
        # SlotToCoeff level's diagonals (reference: sfl_full_3,
        # Bootstrapper.cpp:2481-2494)
        alpha = ctx.scale * self.q0 / (2 * np.pi * delta_in * w.scale)
        out = w
        for i, lev in enumerate(self.s2c_levels):
            if i == len(self.s2c_levels) - 1:
                lev = {d: v * alpha for d, v in lev.items()}
            out = apply_diagonals(ev, enc, out, lev, pt_source=src)
        out = ev.with_scale(out, ctx.scale,
                            reason="SlotToCoeff folded alpha into last LT")
        if self.n_out is not None and out.n_q > self.n_out:
            out = ev.mod_drop_to(out, self.n_out)
        return out


def make_refresh(bt: Bootstrapper, m_bound: float = 1.0):
    """Adapt a Bootstrapper to the model layers' ``refresh(ct, n_q)``
    callback (models/bert.py).  ``m_bound``: values are reinterpreted to
    |m| <= 1 by declaring scale*m_bound before the bootstrap and undoing
    it after — free, but the PHYSICAL EvalMod interval width is
    |v|/q0 = |m|*Delta/q0, so callers must keep |m|*Delta*2^-? within the
    ModReducer's eps (fold real normalization into adjacent plaintext
    constants: LayerNorm gamma before a bootstrap, the next matmul's
    weights after — the reference manages data ranges the same way)."""
    ev = bt.ev

    def refresh(ct, n_q):
        # Deep squaring chains drift the tracked composite scale (pair
        # products sit ~0.1 bits off Delta and the log-drift doubles per
        # squaring: the attention exp/inverse chain delivered the W_O
        # output at scale 2^25 instead of 2^52).  Tracking is exact so
        # decrypts stay correct — but the bootstrap's message precision
        # is |m|*scale/q0, so a sunk scale pushes the message below the
        # EvalMod resolution while the SlotToCoeff alpha fold
        # (ctx.scale*q0 / (2*pi*delta_in*w.scale)) amplifies the fit
        # error by the same factor: the r4 "refresh #2" divergence
        # (|in| 0.055 -> |out| 3.6e4).  Re-land at the canonical scale
        # while a spare level exists; callers keep one level above q0 at
        # every refresh site (models/bert.py does).
        ratio = ct.scale / bt.ctx.scale
        if ct.n_q >= bt.ctx.n_q0 + 2 and not (0.5 <= ratio <= 2.0):
            ct = ev.match_scale(ct, bt.ctx.scale)
        x = ev.mod_drop_to(ct, bt.ctx.n_q0)
        x = ev.with_scale(x, x.scale * m_bound,
                          reason="refresh: normalize |m| <= 1 for EvalMod")
        out = bt(x)
        out = ev.with_scale(out, out.scale / m_bound,
                            reason="refresh: undo m_bound normalization")
        if out.n_q > n_q:
            out = ev.mod_drop_to(out, n_q)
        return out

    return refresh
