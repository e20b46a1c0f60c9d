"""Homomorphic evaluator — the workhorse of the scheme layer.

TPU-native counterpart of SEAL's Evaluator (reference:
thirdparty/SEAL-4.1-bs/native/src/seal/evaluator.cpp: ckks_multiply :770,
relinearize_internal :1345, rescale_to_next :1682, multiply_plain :2154,
apply_galois :2563, rotate_internal :2667, switch_key_inplace :2724; plus
the fork's reduced-error/const convenience ops, evaluator.h:1297-1386).

Design differences (TPU-first):
- Every op is pure jnp over ``Ciphertext`` pytrees with static level/scale
  metadata, so ops compose under ``jax.jit`` and batch over leading axes
  (the reference's per-ciphertext OpenMP loops become one batched call).
- Scale/level bookkeeping is validated at *trace time* (Python asserts on
  static metadata) — the reference's manual ``x.scale() = y`` resets
  (Ct_pt_matrix_mul.hpp:41, softmax.hpp:465) are structured here as
  explicit ``scale_override`` arguments.
- Key-switching is *hybrid* (dnum digits, shared special primes), not
  SEAL's per-limb decomposition: O(dnum * L) NTTs instead of O(L^2).
- Ciphertexts stay in NTT+Montgomery form; only rescale/key-switch
  internals round-trip single limbs through the coefficient domain.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import mod_arith as ma
from .params import Context
from .ciphertext import Ciphertext, Plaintext
from .keys import KSwitchKey, GaloisKeys
from .ntt import ntt, intt


def _close(a: float, b: float, tol=2e-3) -> bool:
    """Scale compatibility check.  Composite-pair rescaling drifts the scale
    by |q_pair/Delta - 1| ~ 1e-4 per level (pairs are chosen above/below the
    target to cancel); additions tolerate that drift, introducing the same
    relative error the reference's manual ``x.scale() = s`` resets do
    (e.g. Ct_pt_matrix_mul.hpp:41)."""
    return abs(a - b) <= tol * max(abs(a), abs(b))


class Evaluator:
    def __init__(self, ctx: Context, relin_key: KSwitchKey | None = None,
                 galois_keys: GaloisKeys | None = None):
        self.ctx = ctx
        self.dev = ctx.device()
        self.tbd = self.dev["ntt"]
        self.relin_key = relin_key
        self.galois_keys = galois_keys
        self._perm_cache = {}
        # optional observability hook: callable(op_name, result_ct) invoked
        # at trace time (utils/debug.OpTrace; the reference's chain-index
        # prints, test_full_scheme.hpp:509-556)
        self.debug = None

    def _dbg(self, name, ct):
        if self.debug is not None:
            self.debug(name, ct)
        return ct

    # -- constants (sliced at trace time) ---------------------------------
    def _q(self, n_q):
        return self.dev["q"][:n_q].reshape(-1, 1)

    def _qneg(self, n_q):
        return self.dev["qneg_inv"][:n_q].reshape(-1, 1)

    # -- additive ops -----------------------------------------------------
    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.n_q == b.n_q, (a.n_q, b.n_q)
        assert _close(a.scale, b.scale), (
            f"add: scales {a.scale:.6g} vs {b.scale:.6g} drift beyond the "
            f"composite-pair tolerance — reconcile with Evaluator.match_scale "
            f"(or land terms exactly via mul_const_to)")
        assert a.is_ntt and b.is_ntt
        return Ciphertext(ma.add_mod(a.data, b.data, self._q(a.n_q)),
                          a.scale, a.is_ntt)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.n_q == b.n_q
        assert _close(a.scale, b.scale), (
            f"sub: scales {a.scale:.6g} vs {b.scale:.6g} drift beyond the "
            f"composite-pair tolerance — reconcile with Evaluator.match_scale")
        return Ciphertext(ma.sub_mod(a.data, b.data, self._q(a.n_q)),
                          a.scale, a.is_ntt)

    def negate(self, a: Ciphertext) -> Ciphertext:
        return a.with_data(ma.neg_mod(a.data, self._q(a.n_q)))

    def add_plain(self, a: Ciphertext, p: Plaintext) -> Ciphertext:
        assert a.n_q == p.n_q and _close(a.scale, p.scale), \
            (a.n_q, p.n_q, a.scale, p.scale)
        q = self._q(a.n_q)
        c0 = ma.add_mod(a.data[..., 0, :, :], p.data, q)
        return a.with_data(
            jnp.concatenate([c0[..., None, :, :], a.data[..., 1:, :, :]],
                            axis=-3))

    def sub_plain(self, a: Ciphertext, p: Plaintext) -> Ciphertext:
        assert a.n_q == p.n_q and _close(a.scale, p.scale)
        q = self._q(a.n_q)
        c0 = ma.sub_mod(a.data[..., 0, :, :], p.data, q)
        return a.with_data(
            jnp.concatenate([c0[..., None, :, :], a.data[..., 1:, :, :]],
                            axis=-3))

    # -- scalar constants (trace-time encoded, no slot vector needed) -----
    def _const_residues_mont(self, value: float, scale: float, n_q: int):
        """round(value*scale) as per-limb Montgomery residues [n_q, 1].
        Fork equivalent: Evaluator::add_const/multiply_const
        (evaluator.h:1297-1340)."""
        v = int(round(value * scale))
        out = np.empty(n_q, dtype=np.uint32)
        for i in range(n_q):
            q = self.ctx.q_primes[i]
            out[i] = (v % q) * ((1 << 32) % q) % q
        return jnp.asarray(out).reshape(-1, 1)

    def add_const(self, a: Ciphertext, value: float) -> Ciphertext:
        c = self._const_residues_mont(value, a.scale, a.n_q)
        q = self._q(a.n_q)
        c0 = ma.add_mod(a.data[..., 0, :, :], c, q)
        return a.with_data(
            jnp.concatenate([c0[..., None, :, :], a.data[..., 1:, :, :]],
                            axis=-3))

    def mul_const(self, a: Ciphertext, value: float,
                  const_scale: float | None = None) -> Ciphertext:
        """Multiply by scalar encoded at ``const_scale`` (default: the pair
        product at the current level, so one level rescale restores scale)."""
        const_scale = const_scale if const_scale is not None else \
            self.level_pair_scale(a.n_q)
        c = self._const_residues_mont(value, const_scale, a.n_q)
        out = ma.mont_mul(a.data, c, self._q(a.n_q), self._qneg(a.n_q))
        return Ciphertext(out, a.scale * const_scale, a.is_ntt)

    def level_pair_scale(self, n_q: int) -> float:
        """Product of the top prime pair at this level (the composite
        'one-level' divisor)."""
        return float(self.ctx.q_primes[n_q - 1]) * float(self.ctx.q_primes[n_q - 2])

    # -- multiplicative ops ----------------------------------------------
    def multiply_plain(self, a: Ciphertext, p: Plaintext) -> Ciphertext:
        assert a.n_q == p.n_q, (a.n_q, p.n_q)
        out = ma.mont_mul(a.data, p.data[..., None, :, :],
                          self._q(a.n_q), self._qneg(a.n_q))
        return self._dbg("multiply_plain",
                         Ciphertext(out, a.scale * p.scale, a.is_ntt))

    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Dyadic ct*ct product -> 3-poly ciphertext (SEAL ckks_multiply,
        evaluator.cpp:770)."""
        assert a.n_q == b.n_q and a.n_polys == 2 and b.n_polys == 2
        q, qneg = self._q(a.n_q), self._qneg(a.n_q)
        a0, a1 = a.data[..., 0, :, :], a.data[..., 1, :, :]
        b0, b1 = b.data[..., 0, :, :], b.data[..., 1, :, :]
        c0 = ma.mont_mul(a0, b0, q, qneg)
        c1 = ma.add_mod(ma.mont_mul(a0, b1, q, qneg),
                        ma.mont_mul(a1, b0, q, qneg), q)
        c2 = ma.mont_mul(a1, b1, q, qneg)
        return self._dbg("multiply", Ciphertext(
            jnp.stack([c0, c1, c2], axis=-3), a.scale * b.scale, True))

    def square(self, a: Ciphertext) -> Ciphertext:
        q, qneg = self._q(a.n_q), self._qneg(a.n_q)
        a0, a1 = a.data[..., 0, :, :], a.data[..., 1, :, :]
        c0 = ma.mont_mul(a0, a0, q, qneg)
        c1 = ma.mont_mul(a0, a1, q, qneg)
        c1 = ma.add_mod(c1, c1, q)
        c2 = ma.mont_mul(a1, a1, q, qneg)
        return Ciphertext(jnp.stack([c0, c1, c2], axis=-3), a.scale * a.scale,
                          True)

    def relinearize(self, a: Ciphertext) -> Ciphertext:
        assert a.n_polys == 3 and self.relin_key is not None
        ks0, ks1 = self._switch_key(a.data[..., 2, :, :], self.relin_key, a.n_q)
        q = self._q(a.n_q)
        c0 = ma.add_mod(a.data[..., 0, :, :], ks0, q)
        c1 = ma.add_mod(a.data[..., 1, :, :], ks1, q)
        return self._dbg("relinearize",
                         Ciphertext(jnp.stack([c0, c1], axis=-3), a.scale,
                                    True))

    def multiply_relin(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self.relinearize(self.multiply(a, b))

    # -- rescale / mod switch --------------------------------------------
    def rescale(self, a: Ciphertext) -> Ciphertext:
        """Drop the top prime, dividing the message by it (SEAL
        rescale_to_next -> divide_and_round_q_last_ntt_inplace,
        evaluator.cpp:1682 / util/rns.h:208)."""
        n_q = a.n_q
        ell = n_q - 1
        assert ell >= 1
        dv = self.dev
        qe = int(self.ctx.q_primes[ell])
        # last limb -> coeff -> true value u = [c_ell + qe/2]
        last = intt(a.data[..., ell:ell + 1, :], self.tbd,
                    limb_slice=(ell, ell + 1))
        q_l = dv["q"][ell:ell + 1].reshape(-1, 1)
        t = ma.from_mont(last, q_l, dv["qneg_inv"][ell:ell + 1].reshape(-1, 1))
        half = jnp.uint32(qe >> 1)
        u = t + half
        u = jnp.where(u >= q_l, u - q_l, u)
        # convert u to each remaining modulus (to_mont handles u >= q_j)
        qj = self._q(ell)
        qnegj = self._qneg(ell)
        r2j = dv["r2"][:ell].reshape(-1, 1)
        uj = ma.to_mont(u, qj, qnegj, r2j)            # [..., ell, N] mont
        # subtract the rounding half per *coefficient* (coeff domain!) so the
        # centered remainder u-h is what gets NTT'd (SEAL rns.cpp
        # divide_and_round_q_last_ntt_inplace does the same).
        hj = dv["resc_half_mod"][ell, :ell].reshape(-1, 1)
        uj = ma.sub_mod(uj, hj, qj)
        u_ntt = ntt(uj, self.tbd, limb_slice=(0, ell))
        qlinv = dv["resc_qlinv_mont"][ell, :ell].reshape(-1, 1)
        num = ma.sub_mod(a.data[..., :ell, :], u_ntt, qj)
        out = ma.mont_mul(num, qlinv, qj, qnegj)
        return self._dbg("rescale", Ciphertext(out, a.scale / qe, True))

    def rescale_pair(self, a: Ciphertext) -> Ciphertext:
        """One *level* rescale = two single-prime rescales (composite scale)."""
        return self.rescale(self.rescale(a))

    def mod_drop(self, a: Ciphertext, n_primes: int = 1) -> Ciphertext:
        """Drop top primes without scaling (SEAL CKKS mod_switch_to_next)."""
        assert a.n_q - n_primes >= 1
        return a.with_data(a.data[..., : a.n_q - n_primes, :])

    def mod_drop_to(self, a: Ciphertext, n_q: int) -> Ciphertext:
        assert n_q <= a.n_q
        return self._dbg("mod_drop_to", a.with_data(a.data[..., :n_q, :]))

    def mod_drop_level(self, a: Ciphertext, n_levels: int = 1) -> Ciphertext:
        """Drop whole composite levels (pairs of primes)."""
        return self.mod_drop(a, 2 * n_levels)

    def plain_mod_drop_to(self, p: Plaintext, n_q: int) -> Plaintext:
        return Plaintext(p.data[..., :n_q, :], p.scale, p.is_ntt)

    # -- key switching core ----------------------------------------------
    def _active_digits(self, n_q: int) -> int:
        return sum(1 for lo, hi in self.ctx.digit_ranges if lo < n_q)

    def _ks_decompose(self, poly_ntt, n_q: int):
        """Digit-decompose + base-extend + NTT: [..., n_q, N] NTT Montgomery
        -> y [..., dnum_act, n_t, N] (NTT Montgomery over Q_l + P).

        This is the rotation-independent half of key switching; hoisting
        (Halevi-Shoup) reuses it across many rotations.
        """
        ctx = self.ctx
        dv = self.dev
        L, K = ctx.L, ctx.K
        nall = L + K
        q_all, qneg_all = dv["q"], dv["qneg_inv"]
        qt = jnp.concatenate([q_all[:n_q], q_all[L:]]).reshape(-1, 1)
        qnegt = jnp.concatenate([qneg_all[:n_q], qneg_all[L:]]).reshape(-1, 1)

        D = self._active_digits(n_q)
        alpha = ctx.alpha
        c = intt(poly_ntt, self.tbd, limb_slice=(0, n_q))
        # zero-pad the limb axis to D*alpha and fold into digits
        # [..., D, alpha, N]; ks_hatinv_mont is zero on padded/inactive
        # positions, so their lambdas vanish.
        pad = D * alpha - n_q
        if pad:
            c = jnp.concatenate(
                [c, jnp.zeros(c.shape[:-2] + (pad, c.shape[-1]), c.dtype)],
                axis=-2)
        cd = c.reshape(c.shape[:-2] + (D, alpha, c.shape[-1]))
        qpad = dv["ks_q_pad"][:D * alpha].reshape(D, alpha, 1)
        qnegpad = dv["ks_qneg_pad"][:D * alpha].reshape(D, alpha, 1)
        hatinv = dv["ks_hatinv_mont"][n_q, :D].reshape(D, alpha, 1)
        lam = ma.from_mont(ma.mont_mul(cd, hatinv, qpad, qnegpad),
                           qpad, qnegpad)               # true, [..., D, a, N]
        # fast base extension y_t = sum_i lam_i * hat_i (Montgomery out):
        # one batched multiply-accumulate per digit-prime position, all
        # digits at once (the per-(digit, prime) scalar chain this replaces
        # was the round-2 bottleneck; SEAL's analog: the switch_key_inplace
        # per-limb MAC, evaluator.cpp:2724).
        hat = dv["ks_hat_mm"][n_q, :D]                  # [D, alpha, nall]
        hat_t = jnp.concatenate([hat[..., :n_q], hat[..., L:]], axis=-1)
        y = None
        for a in range(alpha):
            term = ma.mont_mul(lam[..., :, a, None, :],
                               hat_t[:, a, :, None], qt, qnegt)
            y = term if y is None else ma.add_mod(y, term, qt)
        y_q = ntt(y[..., :n_q, :], self.tbd, limb_slice=(0, n_q))
        y_p = ntt(y[..., n_q:, :], self.tbd, limb_slice=(L, nall))
        return jnp.concatenate([y_q, y_p], axis=-2)     # [..., D, n_t, N]

    def _key_rows(self, key_data, n_q: int, q_limbs: int | None = None):
        """key [..., dnum, 2, q_limbs+K, N] -> rows for targets Q_l + P,
        active digits only: [..., D, 2, n_t, N].  ``q_limbs``: Q limbs
        present in the key tensor (sliced keys, keys.slice_kswitch);
        default = the context's full L."""
        L = q_limbs if q_limbs is not None else self.ctx.L
        assert n_q <= L, (n_q, L)
        D = self._active_digits(n_q)
        kd = key_data[..., :D, :, :, :]
        return jnp.concatenate([kd[..., :n_q, :], kd[..., L:, :]], axis=-2)

    def _ks_mac_moddown(self, y, key_rows, n_q: int):
        """MAC the decomposition ``y`` [..., D, n_t, N] against key rows
        [..., D, 2, n_t, N] and mod-down by P -> (d0, d1) each [..., n_q, N].
        Leading batch axes broadcast (stacked rotation keys included).

        Digit-looped with sequencing barriers: ONE digit's [batch, n_t, N]
        products are live at a time (materializing all D digits for both
        key rows peaked at ~4.5 GB for a 132-ciphertext batched
        relinearization at N=2^15)."""
        dv = self.dev
        L = self.ctx.L
        q_all, qneg_all = dv["q"], dv["qneg_inv"]
        qt = jnp.concatenate([q_all[:n_q], q_all[L:]]).reshape(-1, 1)
        qnegt = jnp.concatenate([qneg_all[:n_q], qneg_all[L:]]).reshape(-1, 1)
        D = y.shape[-3]
        acc0 = acc1 = None
        for d in range(D):
            yd = y[..., d, :, :]
            t0 = ma.mont_mul(yd, key_rows[..., d, 0, :, :], qt, qnegt)
            t1 = ma.mont_mul(yd, key_rows[..., d, 1, :, :], qt, qnegt)
            acc0 = t0 if acc0 is None else ma.add_mod(acc0, t0, qt)
            acc1 = t1 if acc1 is None else ma.add_mod(acc1, t1, qt)
            if D > 1 and d + 1 < D:
                acc0, acc1, y = ma.seq(acc0, acc1, y)
        return (self._mod_down_p(acc0, n_q), self._mod_down_p(acc1, n_q))

    def _switch_key(self, poly_ntt, key: KSwitchKey, n_q: int):
        """Hybrid key switch (SEAL switch_key_inplace, evaluator.cpp:2724,
        redesigned): decompose + extend + NTT once, MAC, mod-down by P."""
        y = self._ks_decompose(poly_ntt, n_q)
        return self._ks_mac_moddown(
            y, self._key_rows(key.data, n_q, key.q_limbs), n_q)

    def _mod_down_p(self, u, n_q: int):
        """Divide a [..., n_q+K, N] NTT poly by P, dropping the P limbs."""
        ctx = self.ctx
        dv = self.dev
        L, K = ctx.L, ctx.K
        u_q = u[..., :n_q, :]
        u_p = u[..., n_q:, :]
        qp = dv["q"][L:].reshape(-1, 1)
        qnegp = dv["qneg_inv"][L:].reshape(-1, 1)
        cp = intt(u_p, self.tbd, limb_slice=(L, L + K))
        lam = ma.from_mont(
            ma.mont_mul(cp, dv["pdown_hatinv_mont"].reshape(-1, 1), qp, qnegp),
            qp, qnegp)
        qj, qnegj = self._q(n_q), self._qneg(n_q)
        w = None
        for i in range(K):
            hat = dv["pdown_hat_modq_mm"][i, :n_q].reshape(-1, 1)
            term = ma.mont_mul(lam[..., i:i + 1, :], hat, qj, qnegj)
            w = term if w is None else ma.add_mod(w, term, qj)
        w_ntt = ntt(w, self.tbd, limb_slice=(0, n_q))
        pinv = dv["pdown_pinv_mont"][:n_q].reshape(-1, 1)
        return ma.mont_mul(ma.sub_mod(u_q, w_ntt, qj), pinv, qj, qnegj)

    # -- Galois / rotations ----------------------------------------------
    def _perm(self, g: int):
        if g not in self._perm_cache:
            assert self.galois_keys is not None and g in self.galois_keys.perms, \
                f"missing galois key for element {g}"
            with jax.ensure_compile_time_eval():
                self._perm_cache[g] = jnp.asarray(self.galois_keys.perms[g])
        return self._perm_cache[g]

    def apply_galois(self, a: Ciphertext, g: int) -> Ciphertext:
        """sigma_g then keyswitch back to the canonical key (SEAL
        apply_galois_inplace, evaluator.cpp:2563)."""
        assert a.n_polys == 2
        perm = self._perm(g)
        d = jnp.take(a.data, perm, axis=-1)
        c0, c1 = d[..., 0, :, :], d[..., 1, :, :]
        ks0, ks1 = self._switch_key(c1, self.galois_keys.keys[g], a.n_q)
        q = self._q(a.n_q)
        return self._dbg("apply_galois", Ciphertext(
            jnp.stack([ma.add_mod(c0, ks0, q), ks1], axis=-3), a.scale,
            True))

    def _naf_digits(self, v: int) -> list[int]:
        """Non-adjacent form: signed powers of two summing to v (at most
        half the nonzero digits of the binary expansion; SEAL's NAF
        fallback, evaluator.cpp:2701-2720 / util/numth.cpp naf)."""
        out = []
        bit = 0
        while v:
            if v & 1:
                d = 2 - (v & 3)               # v mod 4 == 1 -> +1, == 3 -> -1
                out.append(d << bit)
                v -= d
            v >>= 1
            bit += 1
        return out

    def rotate(self, a: Ciphertext, steps: int) -> Ciphertext:
        """Rotate slots by ``steps``; when the exact key is absent, picks
        the cheapest available signed power-of-two decomposition — NAF of
        ``steps`` and of ``steps - n`` (SEAL rotate_internal NAF fallback,
        evaluator.cpp:2701-2720): steps like 2^k - 1 cost ~2 key-switches
        instead of k."""
        n = self.ctx.cfg.N // 2
        steps = steps % n
        if steps == 0:
            return a
        two_n = 2 * self.ctx.cfg.N
        g = pow(5, steps, two_n)
        if self.galois_keys is not None and g in self.galois_keys.keys:
            return self.apply_galois(a, g)
        best = None
        cands = [self._naf_digits(steps), self._naf_digits(steps - n),
                 # plain binary (positive powers only) as a last resort —
                 # key sets without negative-power keys still decompose
                 [1 << b for b in range(n.bit_length())
                  if steps & (1 << b)]]
        for digits in cands:
            elts = [pow(5, d % n, two_n) for d in digits]
            if all(e in self.galois_keys.keys for e in elts):
                if best is None or len(elts) < len(best):
                    best = elts
        assert best is not None, \
            f"no galois key chain for rotation step {steps}"
        out = a
        for e in best:
            out = self.apply_galois(out, e)
        return out

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        return self.apply_galois(a, 2 * self.ctx.cfg.N - 1)

    def _stacked_galois(self, elts: tuple[int, ...]):
        """Stack perms and keys for a tuple of galois elements (cached
        eagerly — never cache values produced under an active trace).
        When key data are jit ARGUMENTS (tracers — the keys-as-data path
        that keeps large tensors out of the compiled HLO body), the key
        stack is rebuilt per trace and only the perms are cached."""
        key = ("stack", elts)
        traced = isinstance(self.galois_keys.keys[elts[0]].data,
                            jax.core.Tracer)
        if key not in self._perm_cache or traced:
            if traced:
                perms = jnp.stack([self._perm(g) for g in elts])
                keys = jnp.stack([self.galois_keys.keys[g].data
                                  for g in elts])
                return perms, keys
            with jax.ensure_compile_time_eval():
                perms = jnp.stack([self._perm(g) for g in elts])
                keys = jnp.stack([self.galois_keys.keys[g].data for g in elts])
            self._perm_cache[key] = (perms, keys)
        return self._perm_cache[key]

    def rotate_hoisted(self, a: Ciphertext, steps: list[int],
                       chunk: int | None = None) -> Ciphertext:
        """Rotate ``a`` by every step in ``steps`` at once; returns a
        ciphertext with a NEW leading axis R = len(steps).

        Halevi-Shoup hoisting, TPU-shaped: the expensive decomposition
        (digit split + base extension + NTTs) runs ONCE; each rotation is a
        gather of the decomposition digits plus a batched MAC with stacked
        keys.  The reference pays the full key-switch per rotation
        (rotations dominate its CCMM and bootstrap cost, SURVEY.md §3.3).
        """
        assert a.n_polys == 2
        two_n = 2 * self.ctx.cfg.N
        n = self.ctx.cfg.N // 2
        elts = tuple(pow(5, s % n, two_n) for s in steps)
        perms, keys = self._stacked_galois(elts)
        n_q = a.n_q
        y = self._ks_decompose(a.data[..., 1, :, :], n_q)   # [..., D, n_t, N]
        if chunk is None:
            chunk = len(steps)
        outs = []
        for s0 in range(0, len(steps), chunk):
            p = perms[s0:s0 + chunk]                        # [R, N]
            k = keys[s0:s0 + chunk]                         # [R, dnum, 2, L+K, N]
            # digits of sigma_g(c1) = sigma_g(digits of c1): gather last axis
            y_r = jnp.take(y, p, axis=-1)                   # [..., D, n_t, R, N]
            y_r = jnp.moveaxis(y_r, -2, 0)                  # [R, ..., D, n_t, N]
            kr = self._key_rows(k, n_q, self.galois_keys.q_limbs)
            #                                               # [R, D, 2, n_t, N]
            if a.data.ndim > 3:                             # broadcast batch
                kr = kr.reshape((kr.shape[0],) + (1,) * (a.data.ndim - 3)
                                + kr.shape[1:])
            d0, d1 = self._ks_mac_moddown(y_r, kr, n_q)
            c0 = jnp.take(a.data[..., 0, :, :], p, axis=-1)  # [..., n_q, R, N]
            c0 = jnp.moveaxis(c0, -2, 0)
            q = self._q(n_q)
            out_c = jnp.stack([ma.add_mod(c0, d0, q), d1], axis=-3)
            if chunk < len(steps):
                # sequence rotation chunks (ma.seq in mod_arith: XLA would
                # otherwise schedule every chunk's MAC temps concurrently)
                out_c, y = ma.seq(out_c, y)
            outs.append(out_c)
        return self._dbg("rotate_hoisted", Ciphertext(
            jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0],
            a.scale, True))

    # -- integer & per-column constant helpers -----------------------------
    def mul_int(self, a: Ciphertext, n: int) -> Ciphertext:
        """Multiply by a small positive integer via binary doubling adds —
        consumes NO level and leaves the scale unchanged (the reference
        computes 768*x the same way, layernorm.hpp:194-212)."""
        assert n >= 1
        q = self._q(a.n_q)
        acc = None
        cur = a.data
        while n:
            if n & 1:
                acc = cur if acc is None else ma.add_mod(acc, cur, q)
            n >>= 1
            if n:
                cur = ma.add_mod(cur, cur, q)
        return a.with_data(acc)

    def mul_const_to(self, a: Ciphertext, value: float,
                     target_scale: float) -> Ciphertext:
        """Multiply by scalar, choosing the constant's encoding scale so that
        after one level rescale the result lands EXACTLY at ``target_scale``
        (kills composite-pair scale drift at every polynomial term)."""
        pair = self.level_pair_scale(a.n_q)
        const_scale = target_scale * pair / a.scale
        return self.mul_const(a, value, const_scale=const_scale)

    def _const_vec_residues_mont(self, values, scale: float, n_q: int):
        """Per-leading-batch scalar constants: values [C] -> Montgomery
        residues [C, 1, n_q, 1] broadcasting over (poly, slot) axes."""
        v = np.round(np.asarray(values, np.float64) * scale).astype(object)
        out = np.empty((len(v), n_q), dtype=np.uint32)
        for i in range(n_q):
            q = self.ctx.q_primes[i]
            r = (1 << 32) % q
            out[:, i] = np.array([(int(x) % q) * r % q for x in v], np.uint32)
        return jnp.asarray(out)[:, None, :, None]

    def mul_const_vec(self, a: Ciphertext, values,
                      target_scale: float | None = None) -> Ciphertext:
        """Per-column scalar multiply: a.data [C, P, n_q, N] x values [C].
        The per-column gamma/beta of LayerNorm need no slot encoding — a
        column's scalar broadcasts over all slots."""
        pair = self.level_pair_scale(a.n_q)
        target_scale = target_scale if target_scale is not None else a.scale
        const_scale = target_scale * pair / a.scale
        c = self._const_vec_residues_mont(values, const_scale, a.n_q)
        out = ma.mont_mul(a.data, c, self._q(a.n_q), self._qneg(a.n_q))
        return Ciphertext(out, a.scale * const_scale, a.is_ntt)

    def add_const_vec(self, a: Ciphertext, values) -> Ciphertext:
        c = self._const_vec_residues_mont(values, a.scale, a.n_q)[:, 0]
        q = self._q(a.n_q)
        c0 = ma.add_mod(a.data[..., 0, :, :], c, q)
        return a.with_data(
            jnp.concatenate([c0[..., None, :, :], a.data[..., 1:, :, :]],
                            axis=-3))

    def align(self, a: Ciphertext, b: Ciphertext
              ) -> tuple[Ciphertext, Ciphertext]:
        """Drop the deeper operand's extra primes so both share n_q."""
        if a.n_q > b.n_q:
            a = self.mod_drop_to(a, b.n_q)
        elif b.n_q > a.n_q:
            b = self.mod_drop_to(b, a.n_q)
        return a, b

    def match_scale(self, a: Ciphertext, target_scale: float) -> Ciphertext:
        """Bring ``a`` to EXACTLY ``target_scale`` by multiplying with a
        constant 1.0 encoded at the reconciling scale, consuming one of
        a's spare levels (OpenFHE-style scale adjustment).  Needed before
        adding/subtracting ciphertexts from different rescale chains:
        26-bit composite pairs drift up to ~1% per level, far above the
        addition tolerance."""
        if abs(a.scale - target_scale) <= 1e-9 * target_scale:
            return a
        return self.rescale_pair(self.mul_const_to(a, 1.0, target_scale))

    def mul_relin_rescale(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """One composite-level ct*ct multiply (align -> mul -> relin ->
        rescale_pair)."""
        a, b = self.align(a, b)
        return self.rescale_pair(self.relinearize(self.multiply(a, b)))

    def square_rescale(self, a: Ciphertext) -> Ciphertext:
        return self.rescale_pair(self.relinearize(self.square(a)))

    # -- scale management -------------------------------------------------
    def with_scale(self, a: Ciphertext, scale: float, *,
                   reason: str) -> Ciphertext:
        """Explicit scale REINTERPRETATION — the only legitimate uses are
        points where the modulus itself changes meaning (bootstrap ModRaise
        multiplies the message by Q/q0; SlotToCoeff folds the final scale
        into its last LT level).  ``reason`` is mandatory so every call site
        documents why a raw override is sound there; for ordinary scale
        reconciliation before add/sub use :meth:`match_scale`, which spends
        a level instead of silently re-labelling the data.  (The reference's
        unchecked ``x.scale() = s`` resets, e.g. Ct_pt_matrix_mul.hpp:41,
        softmax.hpp:465, are the bug surface this guards.)"""
        assert reason and isinstance(reason, str), \
            "with_scale requires a justification string"
        return Ciphertext(a.data, float(scale), a.is_ntt)
