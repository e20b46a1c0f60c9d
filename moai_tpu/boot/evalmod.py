"""EvalMod: homomorphic x mod q0 via multi-interval minimax cosine +
double-angle, and Chebyshev-basis ciphertext polynomial evaluation.

TPU-native counterpart of the reference's ModularReducer + minimax stack
(reference: include/source/bootstrapping/ModularReducer.{h,cpp} — cos
minimax K=25/deg 59 + 2 double-angle steps + deg-1 arcsin folded into
scaling; common/Remez.cpp NTL exchange solver; common/Polynomial.cpp:255
homomorphic Chebyshev evaluation).  Differences:

- The minimax fit runs in numpy float64 with Lawson-iterated weighted
  least squares on the interval union (instead of a 1000-bit NTL Remez
  exchange); accuracy is bounded by the CKKS noise floor (~2^-40), well
  inside float64.
- Chebyshev evaluation uses the T_{2j}=2T_j^2-1 / T_{2j+1}=2T_jT_{j+1}-T_1
  recurrence ladder (log-depth); BSGS quotient/remainder is a later perf
  upgrade.
"""

from __future__ import annotations

import numpy as np

from .. import mod_arith as ma
from ..ciphertext import Ciphertext
from ..evaluator import Evaluator


def fit_cos_multi_interval(K: int, eps: float, degree: int,
                           double_angles: int, n_grid_per: int = 64,
                           lawson_iters: int = 12):
    """Fit P(x), x in [-1,1], to cos(2*pi*scale*x) over the union of
    intervals mapped from t in [i - eps, i + eps], |i| <= K, where
    s = (t - 0.25)/2^double_angles and x = s / x_max, x_max =
    (K + 0.5)/2^double_angles.  Returns (cheb_coeffs, x_max).

    After ``double_angles`` applications of c <- 2c^2 - 1 the result is
    cos(2*pi*(t - 0.25)) = sin(2*pi*t)  (the reference's RemezCos target,
    RemezCos.h:13-17, with scale_factor=2 meaning 2 doublings).
    """
    da = 1 << double_angles
    x_max = (K + 0.5) / da
    xs = []
    for i in range(-K, K + 1):
        t = np.linspace(i - eps, i + eps, n_grid_per)
        xs.append((t - 0.25) / da / x_max)
    xs = np.concatenate(xs)
    target = np.cos(2 * np.pi * (x_max * xs))
    w = np.ones_like(xs)
    V = np.polynomial.chebyshev.chebvander(xs, degree)
    coef = None
    for _ in range(lawson_iters):
        sw = np.sqrt(w)
        coef, *_ = np.linalg.lstsq(V * sw[:, None], target * sw, rcond=None)
        err = np.abs(V @ coef - target)
        w = w * (1e-12 + err)
        w /= w.sum()
    return coef, x_max


def cheb_eval(ev: Evaluator, x: Ciphertext, coeffs: np.ndarray
              ) -> Ciphertext:
    """sum_k coeffs[k] T_k(x) for x in [-1, 1] (ciphertext).

    T_k built by the doubling recurrence (depth ceil(log2 deg)+1), every
    term landed at x.scale exactly, then a level-aligned sum.
    (Reference: Polynomial::homomorphic_poly_evaluation,
    common/Polynomial.cpp:255.)"""
    coeffs = np.asarray(coeffs, np.float64)
    deg = len(coeffs) - 1
    target = x.scale
    T: dict[int, Ciphertext] = {1: x}

    def get(k: int) -> Ciphertext:
        if k in T:
            return T[k]
        j = k // 2
        if k % 2 == 0:
            tj = get(j)
            out = ev.add_const(ev.mul_int(ev.square_rescale(tj), 2), -1.0)
        else:
            a, b = get(j), get(j + 1)
            ab = ev.mul_int(ev.mul_relin_rescale(a, b), 2)
            t1 = ev.match_scale(x, ab.scale)   # exact-scale T_1 copy
            out = ev.sub(*ev.align(ab, t1))
        T[k] = out
        return out

    terms = []
    for k in range(1, deg + 1):
        if abs(coeffs[k]) < 1e-15:
            continue
        p = get(k)
        terms.append(ev.rescale_pair(ev.mul_const_to(p, coeffs[k], target)))
    n_min = min(t.n_q for t in terms)
    acc = None
    for t in terms:
        t = ev.mod_drop_to(t, n_min)
        acc = t if acc is None else ev.add(acc, t)
    return ev.add_const(acc, float(coeffs[0]))


def _cheb_divmod(c, s):
    """Chebyshev-basis division p = q*T_s + r with deg r < s, using
    T_k = 2*T_s*T_{k-s} - T_{|k-2s|} (k > s) and T_s*T_0 = T_s."""
    c = [float(v) for v in c]
    d = len(c) - 1
    if d < s:
        return [0.0], c
    q = [0.0] * (d - s + 1)
    for k in range(d, s - 1, -1):
        a = c[k]
        if a == 0.0:
            continue
        c[k] = 0.0
        if k == s:
            q[0] += a
        else:
            q[k - s] += 2.0 * a
            c[abs(k - 2 * s)] -= a
    return q, c[:s]


def _trim(c):
    d = len(c) - 1
    while d > 0 and c[d] == 0.0:
        d -= 1
    return c[:d + 1]


def cheb_eval_bsgs(ev: Evaluator, x: Ciphertext, coeffs: np.ndarray
                   ) -> Ciphertext:
    """Baby-step/giant-step Chebyshev evaluation: ~2*sqrt(deg) ct-ct
    multiplies instead of ~deg, same multiplicative depth (reference's
    poly-heap evaluation: Polynomial::generate_poly_heap +
    homomorphic_poly_evaluation, common/Polynomial.cpp:255; the quotient/
    remainder recursion is the Han-Ki/Bossuat-style BSGS).

    Exact-scale discipline: every leaf coefficient multiply lands at a
    computed target so each quotient*T_s product rescales EXACTLY to its
    parent's target scale — no drift, no match_scale levels.
    """
    coeffs = _trim(list(np.asarray(coeffs, np.float64)))
    deg = len(coeffs) - 1
    tgt = x.scale
    if deg < 4:
        return cheb_eval(ev, x, coeffs)
    g = 1 << max(1, (deg + 1).bit_length() // 2)
    m = 0
    while (g << m) <= deg:
        m += 1

    # babies T_1..T_g and giants T_{2g}, ..., T_{g*2^(m-1)}
    T: dict[int, Ciphertext] = {1: x}

    def get(k: int) -> Ciphertext:
        if k in T:
            return T[k]
        j = k // 2
        if k % 2 == 0:
            tj = get(j)
            out = ev.add_const(ev.mul_int(ev.square_rescale(tj), 2), -1.0)
        else:
            a, b = get(j), get(j + 1)
            ab = ev.mul_int(ev.mul_relin_rescale(a, b), 2)
            t1 = ev.match_scale(x, ab.scale)
            out = ev.sub(*ev.align(ab, t1))
        T[k] = out
        return out

    for k in range(2, g + 1):
        get(k)
    s = g
    for _ in range(m - 1):
        s *= 2
        get(s)

    def pred_nq(c) -> int:
        """Predict the result level of rec(c) without emitting ops."""
        c = _trim(c)
        d = len(c) - 1
        if d == 0:
            return x.n_q - 2               # constant path: one rescale
        if d <= g:
            return min(T[k].n_q for k in range(1, d + 1)
                       if c[k] != 0.0) - 2
        s_ = g
        while (s_ << 1) <= d:
            s_ <<= 1
        qc, rc = _cheb_divmod(c, s_)
        qn = pred_nq(qc)
        prod = min(qn, T[s_].n_q) - 2
        rn = pred_nq(_trim(rc))
        return min(prod, rn) if _trim(rc) != [0.0] else prod

    def rec(c, target: float) -> Ciphertext:
        c = _trim(c)
        d = len(c) - 1
        if d == 0:
            # constant polynomial: encode as const * (drop to a real ct)
            base = ev.mod_drop_to(x, x.n_q)
            z = ev.rescale_pair(ev.mul_const_to(base, 0.0, target))
            return ev.add_const(z, c[0])
        if d <= g:
            terms = []
            for k in range(1, d + 1):
                if c[k] == 0.0:
                    continue
                terms.append(ev.rescale_pair(
                    ev.mul_const_to(T[k], c[k], target)))
            n_min = min(t.n_q for t in terms)
            acc = None
            for t in terms:
                t = ev.mod_drop_to(t, n_min)
                acc = t if acc is None else ev.add(acc, t)
            return ev.add_const(acc, c[0])
        s_ = g
        while (s_ << 1) <= d:
            s_ <<= 1
        qc, rc = _cheb_divmod(c, s_)
        Ts = T[s_]
        qn = pred_nq(qc)
        pair_p = ev.level_pair_scale(min(qn, Ts.n_q))
        q_target = target * pair_p / Ts.scale
        qv = rec(qc, q_target)
        prod = ev.mul_relin_rescale(qv, Ts)      # scale == target exactly
        rc = _trim(rc)
        if rc == [0.0]:
            return prod
        # serialize the sibling remainder subtree behind the quotient one
        # (ma.seq in mod_arith): the independent BSGS subtrees otherwise
        # schedule concurrently — a deg-24 GELU on a 128x22-limb batch
        # compiled to a 42 GB schedule on the 16 GB chip
        ks = sorted(T)
        seq_out = ma.seq(prod.data, *[T[k].data for k in ks])
        prod = prod.with_data(seq_out[0])
        for i, k in enumerate(ks):
            T[k] = T[k].with_data(seq_out[1 + i])
        rv = rec(rc, target)
        return ev.add(*ev.align(prod, rv))

    return rec(coeffs, tgt)


class ModReducer:
    """Homomorphic t -> sin(2*pi*t) for t = m*Delta/q0 + I, |I| <= K
    (reference: ModularReducer::modular_reduction, ModularReducer.cpp:58).

    The deg-1 arcsin step and the /(2*pi) are folded into downstream
    scale bookkeeping by the Bootstrapper (the reference folds them into
    SlotToCoeff coefficients, Bootstrapper.cpp:2481-2494)."""

    def __init__(self, K: int = 25, eps: float = 2.0 ** -7,
                 degree: int = 59, double_angles: int = 2,
                 arcsin_deg: int = 1):
        """``arcsin_deg``: 1 folds the linear arcsin term into downstream
        scaling (reference default, ModularReducer.cpp:42-47); 3 adds the
        homomorphic cubic correction y + y^3/6 (+2 levels), cutting the
        residual from O(y^3) to O(y^5) — needed when |m| >> 1 widens the
        physical EvalMod interval (reference: inverse_deg parameter,
        ModularReducer.h:15)."""
        assert arcsin_deg in (1, 3)
        self.K, self.eps = K, eps
        self.degree, self.double_angles = degree, double_angles
        self.arcsin_deg = arcsin_deg
        self.coef, self.x_max = fit_cos_multi_interval(
            K, eps, degree, double_angles)

    @property
    def levels(self) -> int:
        """Composite levels consumed (input prescale + ladder + coeff
        mult + double angles + optional cubic arcsin)."""
        deg = self.degree
        ladder = (deg.bit_length() - 1) + 1
        return 1 + ladder + 1 + self.double_angles + \
            (2 if self.arcsin_deg >= 3 else 0)

    def __call__(self, ev: Evaluator, t: Ciphertext,
                 pre_scale: float = 1.0,
                 work_scale: float | None = None) -> Ciphertext:
        """t (slots hold m*Delta/q0 + I, possibly pre-divided by
        ``pre_scale``): returns ct whose slots are sin(2*pi*t) at the
        working scale.  ``pre_scale`` multiplies the input first (used to
        fold the 1/2 of the real/imag split in for free).

        ``work_scale`` is the scale the Chebyshev ladder lands at.  It
        MUST match the pair product of the levels the ladder actually
        consumes: on a mixed chain (26-bit data pairs + 29-bit boot
        pairs, flagship_config) every rescale inside the bootstrap region
        divides by a ~2^58 boot pair, so landing at ctx.scale (the 2^52
        DATA pair product) shrinks the true scale by the ratio at every
        squaring — compounding squared (2^52 -> 2^46 -> 2^34 -> 2^10 ...)
        until the message sinks below the rescale rounding floor while
        the tracked metadata stays "exact" (the committed err-1.7e35
        signature of tools/flagship_n16.py round 4).  Defaults to the
        pair product at the input's level."""
        da = 1 << self.double_angles
        if work_scale is None:
            work_scale = ev.level_pair_scale(t.n_q)
        # x = (t - 0.25)/(da * x_max): one const mult + const add.  The
        # multiply also drops the ciphertext from its reinterpreted scale
        # (~q0) to the working scale, keeping the ladder's squares
        # scale-stable.
        a = pre_scale / (da * self.x_max)
        x = ev.rescale_pair(ev.mul_const_to(t, a, work_scale))
        x = ev.add_const(x, -0.25 / (da * self.x_max))
        c = cheb_eval_bsgs(ev, x, self.coef)
        for _ in range(self.double_angles):
            c = ev.add_const(ev.mul_int(ev.square_rescale(c), 2), -1.0)
        if self.arcsin_deg >= 3:
            # arcsin(y) ~= y + y^3/6: evaluate y^2 and y/6 in parallel
            # (both one level), multiply, add — 2 levels total.  c6's
            # landing scale is chosen so y2*c6 rescales EXACTLY to c.scale.
            y2 = ev.square_rescale(c)
            pair2 = ev.level_pair_scale(y2.n_q)
            c6 = ev.rescale_pair(ev.mul_const_to(
                c, 1.0 / 6.0, c.scale * pair2 / y2.scale))
            y3 = ev.mul_relin_rescale(y2, c6)
            c = ev.add(*ev.align(c, y3))
        return c
