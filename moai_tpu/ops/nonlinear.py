"""Polynomial nonlinearities: exp, inverse, rsqrt, GELU, softmax, LayerNorm.

TPU-native counterparts of the reference nonlinear layer
(reference: include/source/non_linear_func/softmax.hpp:9-580,
layernorm.hpp:4-546, gelu_others.hpp:4-154).  Everything here is a pure
composition of Evaluator primitives over *batched* ciphertexts — the
reference's per-ciphertext OpenMP loops (e.g. 128 exp calls,
softmax.hpp:408; 3072 gelu calls, test_full_scheme.hpp:884) are single
batched calls on the leading axis.

Design notes (not a port):
- Scale drift is killed exactly: every polynomial term is driven to a
  common target scale with Evaluator.mul_const_to, instead of the
  reference's manual ``x.scale() = s`` resets (softmax.hpp:465).
- Approximation coefficients (GELU polynomial, rsqrt init line) are FIT
  HERE on host (numpy Chebyshev / minimax grid) rather than hard-coded,
  so domains are explicit parameters.
- The bootstrap slot is a ``refresh`` callback: the model layer passes the
  real bootstrapper; tests pass a harness Recryptor (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax.numpy as jnp

from .. import mod_arith as ma
from ..ciphertext import Ciphertext, Plaintext
from ..evaluator import Evaluator
from ..encoder import Encoder
from ..keys import _to_mont_host
from ..ntt import ntt


# --------------------------------------------------------------------------
# host-side plaintext helper
# --------------------------------------------------------------------------

def encode_plain(ev: Evaluator, encoder: Encoder, vals, scale: float,
                 n_q: int) -> Plaintext:
    """Host-encode slot values -> NTT+Montgomery Plaintext at (scale, n_q).
    The device NTT runs as ONE jitted dispatch (boot.linear._pt_ntt)."""
    from ..boot.linear import _pt_ntt
    res = encoder.encode(vals, scale=scale, n_q=n_q)
    mont = _to_mont_host(res, ev.ctx.q_primes[:n_q])
    return Plaintext(data=_pt_ntt(ev, jnp.asarray(mont), n_q), scale=scale)


# --------------------------------------------------------------------------
# scalar-function primitives
# --------------------------------------------------------------------------

def exp_taylor_primes(r: int) -> int:
    """Primes consumed by :func:`exp_taylor` (1 const-mult + r squarings =
    r+1 composite levels = 2*(r+1) primes).  Shared by exp_taylor and
    softmax_pts so a ladder change cannot silently desync the precomputed
    plaintext levels (ADVICE r4)."""
    return 2 * (r + 1)


def exp_taylor(ev: Evaluator, x: Ciphertext, r: int = 7) -> Ciphertext:
    """exp(x) ~= (1 + x/2^r)^(2^r); r=7 -> 1 const-mult + 7 squarings =
    8 composite levels (``exp_taylor_primes(r)`` primes; reference: exp,
    softmax.hpp:9-47).  Accurate for x <= 0 (softmax uses x - max)."""
    y = ev.rescale_pair(ev.mul_const_to(x, 1.0 / (1 << r), x.scale))
    y = ev.add_const(y, 1.0)
    for _ in range(r):
        y = ev.square_rescale(y)
    return y


def inverse_goldschmidt(ev: Evaluator, x: Ciphertext, iters: int = 16,
                        reland_every: int = 0) -> Ciphertext:
    """1/x for x in (0, 2): y = 1-x; 1/x = prod_{i=0..iters} (1 + y^(2^i)).
    iters+1 composite levels (reference: inverse, softmax.hpp:49-82).

    SCALE-DRIFT WARNING: composite-pair rescaling drifts the scale ~2^-12
    per level and a squaring DOUBLES the accumulated log-drift, so a long
    squaring chain grows its true scale exponentially (measured: x57
    after 11 unrelanded squarings).  The static metadata tracks the drift
    EXACTLY — results stay correct — but callers must keep m*scale inside
    the remaining modulus: never let a deep-iters output descend to the
    bottom q0 level (leave >= one composite level), or set
    ``reland_every=k`` to re-land y and res at the input scale every k
    squarings at the cost of one EXTRA level each (depth becomes
    iters + 1 + floor((iters-1)/k))."""
    tgt = x.scale
    y = ev.add_const(ev.negate(x), 1.0)
    res = ev.add_const(y, 1.0)
    for i in range(iters):
        y = ev.square_rescale(y)
        if reland_every and (i + 1) % reland_every == 0 and i + 1 < iters:
            y = ev.match_scale(y, tgt)
            res = ev.match_scale(res, tgt)
        res = ev.mul_relin_rescale(res, ev.add_const(y, 1.0))
    return res


def fit_rsqrt_line(lo: float, hi: float) -> tuple[float, float]:
    """Host: near-minimax linear init a*x+b for 1/sqrt(x) on [lo, hi]
    (reference hard-codes the line, layernorm.hpp:18-24; here it is fit
    from the declared domain)."""
    xs = np.linspace(lo, hi, 4097)
    f = 1.0 / np.sqrt(xs)
    a, b = np.polyfit(xs, f, 1)
    # equioscillate: shift intercept to center the max error
    err = f - (a * xs + b)
    b += (err.max() + err.min()) / 2
    return float(a), float(b)


def fit_rsqrt_cheb(lo: float, hi: float, degree: int = 7,
                   lawson_iters: int = 60) -> np.ndarray:
    """Host: RELATIVE-minimax (Lawson-weighted) Chebyshev fit of 1/sqrt(u)
    on [lo, hi], coefficients in t = (2u - hi - lo)/(hi - lo).  Relative
    weighting keeps the init within (0, sqrt(3))x the true value over
    arbitrarily wide domains — the absolute-error linear init (the
    reference's initGuess, layernorm.hpp:18-24) diverges under Newton when
    hi/lo > ~20, which real BERT layer-10/11 variance data exceeds."""
    k = np.arange(8192)
    t = np.cos(np.pi * (k + 0.5) / len(k))
    u = (t + 1) / 2 * (hi - lo) + lo
    f = 1.0 / np.sqrt(u)
    V = np.polynomial.chebyshev.chebvander(t, degree)
    w = np.ones_like(u)
    c = None
    for _ in range(lawson_iters):
        sw = np.sqrt(w)
        c, *_ = np.linalg.lstsq(V * sw[:, None], f * sw, rcond=None)
        err = np.abs(V @ c - f) / f
        w = w * (1e-12 + err)
        w /= w.sum()
    return c


def invert_sqrt_cheb(ev: Evaluator, x: Ciphertext,
                     domain: tuple[float, float], degree: int = 7,
                     newton_iters: int = 2, _cache: dict = {}) -> Ciphertext:
    """1/sqrt(x) on [lo, hi] via a degree-``degree`` relative-minimax
    Chebyshev init + Newton.  Robust on wide domains (hi/lo up to ~100:
    deg-7 init is within 5% everywhere, 2 Newton steps land ~2e-5 —
    measured on real BERT layer-11 variance spread).  Levels:
    1 (affine) + cheb depth + 3*newton."""
    from ..boot.evalmod import cheb_eval_bsgs
    lo, hi = domain
    key = (round(lo, 14), round(hi, 14), degree)
    if key not in _cache:
        _cache[key] = fit_rsqrt_cheb(lo, hi, degree)
    s = x.scale
    t = ev.add_const(ev.rescale_pair(ev.mul_const_to(x, 2.0 / (hi - lo), s)),
                     -(hi + lo) / (hi - lo))
    y = cheb_eval_bsgs(ev, t, _cache[key])
    if newton_iters:
        xh = ev.rescale_pair(ev.mul_const_to(x, -0.5, s))   # -x/2
        xh, y = ev.align(xh, y)
        for _ in range(newton_iters):
            y2 = ev.square_rescale(y)
            tt = ev.add_const(ev.mul_relin_rescale(xh, y2), 1.5)
            y = ev.mul_relin_rescale(y, tt)
    return y


def invert_sqrt(ev: Evaluator, x: Ciphertext, domain: tuple[float, float],
                newton_iters: int = 4, gold_iters: int = 2) -> Ciphertext:
    """1/sqrt(x) on [lo, hi]: linear init + Newton y(1.5 - 0.5 x y^2) +
    Goldschmidt coupled refinement (reference: initGuess/newtonIter/
    goldSchmidtIter/invert_sqrt, layernorm.hpp:18-155).

    Levels: 1 (init) + 1 (xh) + 3*newton + 1 (g) + 1 (h) + 2*gold.
    """
    a, b = fit_rsqrt_line(*domain)
    s = x.scale
    y = ev.add_const(ev.rescale_pair(ev.mul_const_to(x, a, s)), b)
    xh = ev.rescale_pair(ev.mul_const_to(x, -0.5, s))      # -x/2, reused
    for _ in range(newton_iters):
        y2 = ev.square_rescale(y)
        t = ev.add_const(ev.mul_relin_rescale(xh, y2), 1.5)
        y = ev.mul_relin_rescale(y, t)
    if gold_iters:
        g = ev.mul_relin_rescale(x, y)                      # ~ sqrt(x)
        h = ev.rescale_pair(ev.mul_const_to(y, 0.5, s))     # ~ 1/(2 sqrt x)
        for _ in range(gold_iters):
            # g <- g*(1+r), h <- h*(1+r): pure products — adds of
            # differently-rescaled ciphertexts would hit composite-pair
            # scale drift (26-bit prime granularity)
            r1 = ev.add_const(ev.negate(ev.mul_relin_rescale(g, h)), 1.5)
            g = ev.mul_relin_rescale(g, r1)
            h = ev.mul_relin_rescale(h, r1)
        y = ev.mul_int(h, 2)
    return y


# --------------------------------------------------------------------------
# polynomial evaluation (monomial basis, binary-power ladder)
# --------------------------------------------------------------------------

def _power(ev: Evaluator, pows: dict, k: int) -> Ciphertext:
    if k in pows:
        return pows[k]
    h = 1 << (k.bit_length() - 1)
    if h == k:
        out = ev.square_rescale(_power(ev, pows, k // 2))
    else:
        out = ev.mul_relin_rescale(_power(ev, pows, h),
                                   _power(ev, pows, k - h))
    pows[k] = out
    return out


def poly_eval(ev: Evaluator, x: Ciphertext, coeffs: np.ndarray) -> Ciphertext:
    """sum_k coeffs[k] * x^k with x in ~[-1, 1].  Binary-power ladder as in
    the reference's square/mult chain (gelu_others.hpp:38-121), but every
    term is landed at one exact common scale, then summed level-aligned."""
    coeffs = np.asarray(coeffs, np.float64)
    deg = len(coeffs) - 1
    pows: dict[int, Ciphertext] = {1: x}
    terms = []
    target = x.scale
    for k in range(1, deg + 1):
        if coeffs[k] == 0.0:
            continue
        p = _power(ev, pows, k)
        terms.append(ev.rescale_pair(ev.mul_const_to(p, coeffs[k], target)))
    n_min = min(t.n_q for t in terms)
    acc = None
    for t in terms:
        t = ev.mod_drop_to(t, n_min)
        acc = t if acc is None else ev.add(acc, t)
    return ev.add_const(acc, float(coeffs[0]))


def fit_gelu_cheb(domain: float = 13.0, degree: int = 24,
                  lawson_iters: int = 30) -> np.ndarray:
    """Host: Lawson-iterated (near-minimax) Chebyshev fit of GELU on
    [-domain, domain]; coefficients in u = x/domain.  ~2x tighter than a
    plain LS fit (0.011 vs 0.018 max err at domain 16, degree 32)."""
    from scipy.special import erf  # available via jax deps
    k = np.arange(8192)
    xs = np.cos(np.pi * (k + 0.5) / len(k))
    g = 0.5 * (xs * domain) * (1.0 + erf(xs * domain / np.sqrt(2.0)))
    V = np.polynomial.chebyshev.chebvander(xs, degree)
    w = np.ones_like(xs)
    c = None
    for _ in range(lawson_iters):
        sw = np.sqrt(w)
        c, *_ = np.linalg.lstsq(V * sw[:, None], g * sw, rcond=None)
        err = np.abs(V @ c - g)
        w = w * (1e-12 + err)
        w /= w.sum()
    return c


def fit_gelu_coeffs(domain: float = 13.0, degree: int = 24) -> np.ndarray:
    """Host: near-minimax fit of GELU on [-domain, domain] as monomial
    coefficients in u = x/domain (the reference hard-codes a degree-24
    monomial polynomial with an s0=0.1 prescale, gelu_others.hpp:23-35;
    here the fit is generated).  Prefer ``fit_gelu_cheb`` + ``cheb_eval``
    for the encrypted path: monomial coefficients of a degree-d Chebyshev
    fit grow ~2^d and amplify CKKS noise by the same factor."""
    return np.polynomial.chebyshev.cheb2poly(fit_gelu_cheb(domain, degree))


def gelu(ev: Evaluator, x: Ciphertext, domain: float = 13.0,
         degree: int = 24, _cache: dict = {}) -> Ciphertext:
    """GELU(x) on [-domain, domain]; 1 (prescale) + ceil(log2 deg) + 1
    composite levels (reference: gelu_v2, gelu_others.hpp:4-154 — monomial
    power ladder; here a Chebyshev-basis doubling ladder, whose O(1)
    coefficients avoid the monomial basis' 2^degree noise blowup, so
    degree 32 costs the same depth as 24 with ~5x less error)."""
    from ..boot.evalmod import cheb_eval_bsgs
    key = (domain, degree)
    if key not in _cache:
        _cache[key] = fit_gelu_cheb(domain, degree)
    u = ev.rescale_pair(ev.mul_const_to(x, 1.0 / domain, x.scale))
    return cheb_eval_bsgs(ev, u, _cache[key])


def sign_composite(ev: Evaluator, x: Ciphertext, polys) -> Ciphertext:
    """sgn(x) for |x| in [tau, 1] via composed odd minimax polynomials
    (reference: sgn_eval's f4∘f4∘g4∘g4 chain, gelu.hpp:109-147; the
    polynomials here come from minimax.fit_sign_composite instead of
    hard-coded coefficient tables)."""
    from ..boot.evalmod import cheb_eval_bsgs
    for p in polys:
        x = cheb_eval_bsgs(ev, x, p)
    return x


def gelu_sign(ev: Evaluator, x: Ciphertext, breakpoint: float = 3.5,
              input_bound: float = 60.0, degrees=(9, 9, 9, 9),
              mid_degree: int = 12, _cache: dict = {}) -> Ciphertext:
    """Piecewise GELU via two homomorphic sign evaluations at ±breakpoint
    (reference: gelu, gelu.hpp:149-377 — NEXUS-style: x scaled by
    1/input_bound, sgn at breakpoints ±3.5, blended with a mid-range
    polynomial):

        gelu(x) ~= A(x)·(sgn(x+b) − sgn(x−b))/2 + x·(1 + sgn(x−b))/2

    with A a minimax fit of GELU on [−b, b] (the reference uses a fixed
    degree-12 polynomial, gelu.hpp:279-311)."""
    from scipy.special import erf
    from ..minimax import remez_fit, fit_sign_composite
    key = (breakpoint, input_bound, tuple(degrees), mid_degree)
    if key not in _cache:
        polys, _ = fit_sign_composite(
            min(0.5 / input_bound, breakpoint / input_bound / 4), list(degrees))
        g = lambda u: 0.5 * (u * breakpoint) * (
            1.0 + erf(u * breakpoint / np.sqrt(2.0)))
        mid, _ = remez_fit(g, [(-1.0, 1.0)], mid_degree)
        _cache[key] = (polys, mid)
    polys, mid = _cache[key]
    from ..boot.evalmod import cheb_eval_bsgs as cheb_eval
    b = breakpoint
    u = ev.rescale_pair(ev.mul_const_to(x, 1.0 / input_bound, x.scale))
    s0 = sign_composite(ev, ev.add_const(u, b / input_bound), polys)
    s1 = sign_composite(ev, ev.add_const(u, -b / input_bound), polys)
    # A evaluated in v = x/b
    v = ev.rescale_pair(ev.mul_const_to(x, 1.0 / b, x.scale))
    A = cheb_eval(ev, v, mid)
    half_diff = ev.rescale_pair(ev.mul_const_to(
        ev.sub(*ev.align(s0, s1)), 0.5, ev.level_pair_scale(
            min(s0.n_q, s1.n_q))))
    half_hi = ev.add_const(ev.rescale_pair(ev.mul_const_to(
        s1, 0.5, ev.level_pair_scale(s1.n_q))), 0.5)
    t1 = ev.mul_relin_rescale(*ev.align(A, half_diff))
    t2 = ev.mul_relin_rescale(*ev.align(x, half_hi))
    t2 = ev.match_scale(t2, t1.scale)
    return ev.add(*ev.align(t1, t2))


# --------------------------------------------------------------------------
# LayerNorm
# --------------------------------------------------------------------------

def _sum_leading(data, q):
    n = data.shape[0]
    while n > 1:
        half = n // 2
        ext = ma.add_mod(data[:half], data[half:2 * half], q)
        data = ext if n % 2 == 0 else \
            jnp.concatenate([ext, data[2 * half:]], axis=0)
        n = data.shape[0]
    return data[0]


def layernorm(ev: Evaluator, x: Ciphertext, gamma: np.ndarray,
              beta: np.ndarray, var_domain: tuple[float, float],
              newton_iters: int = 4, gold_iters: int = 2,
              col_chunk: int | None = None,
              rsqrt: str = "newton") -> Ciphertext:
    """Per-slot (= per token) LayerNorm over the leading column axis C:
        y_j = gamma_j * (x_j - mu)/sigma + beta_j.

    With d_j = C*x_j - sum(x) (no level: integer doubling + free column
    sum), S = sum_j d_j^2:  (x_j - mu)/sigma = sqrt(C) * d_j / sqrt(S).
    ``var_domain`` is the expected range of S (reference normalizes by
    hard-coded 1/768^3 constants, layernorm.hpp:240-295; here the domain
    is explicit and folded into the rsqrt init).

    Reference: layernorm/layernorm2, layernorm.hpp:157-546 — one rsqrt
    shared by all C columns, as here (the rsqrt runs on a single
    unbatched ciphertext).
    """
    C = x.data.shape[0]
    q = ev.dev["q"][:x.n_q].reshape(-1, 1)
    cc = col_chunk if col_chunk else C

    def d_cols(lo, hi):
        """chunk of C*x_j - u (no level: integer doubling + free sums)."""
        nx = ev.mul_int(x.with_data(xd[lo:hi]), C)
        return x.with_data(ma.sub_mod(nx.data, u[None], q))

    xd = x.data
    u = None
    for lo in range(0, C, cc):                             # pass 1: sum x
        s = _sum_leading(xd[lo:lo + cc], q)
        u = s if u is None else ma.add_mod(u, s, q)
        u, xd = ma.seq(u, xd)                # sequence chunks (ma.seq doc)
    # pass 2: S = sum_j (C x_j - u)^2.  The 3-poly squares are summed over
    # the column axis BEFORE relinearizing, so the whole variance costs ONE
    # key-switch (the reference relinearizes per blocked product,
    # layernorm.hpp:240-266); chunking bounds residency at d_model=768.
    S3 = None
    for lo in range(0, C, cc):
        sq = ev.square(d_cols(lo, min(lo + cc, C)))        # [c, 3, L, N]
        s = _sum_leading(sq.data, q)
        S3 = s if S3 is None else ma.add_mod(S3, s, q)
        S3, xd = ma.seq(S3, xd)
    S = ev.rescale_pair(ev.relinearize(
        Ciphertext(S3, x.scale * x.scale, True)))
    lo_d, hi_d = var_domain
    c = 1.0 / hi_d                                         # S*c in (lo/hi, 1]
    Sn = ev.rescale_pair(ev.mul_const_to(S, c, S.scale))
    # rsqrt="cheb": relative-minimax Chebyshev init (invert_sqrt_cheb) —
    # required when hi/lo > ~20 (real BERT layers 10-11), where the linear
    # init diverges under Newton
    rs = invert_sqrt_cheb(ev, Sn, (lo_d / hi_d, 1.0),
                          newton_iters=newton_iters) if rsqrt == "cheb" \
        else invert_sqrt(ev, Sn, (lo_d / hi_d, 1.0), newton_iters,
                         gold_iters)
    # pass 3: y_j = d_j * rs * (gamma_j * sqrt(C) * sqrt(c)) + beta_j
    gscale = np.asarray(gamma, np.float64) * np.sqrt(C) * np.sqrt(c)
    beta = np.asarray(beta, np.float64)
    outs = []
    out_scale = None
    for lo in range(0, C, cc):
        hi = min(lo + cc, C)
        dn, rsn = ev.align(d_cols(lo, hi), rs)
        prod = ev.mul_relin_rescale(dn, rsn.with_data(
            jnp.broadcast_to(rsn.data[None], dn.data.shape)))
        o = ev.rescale_pair(ev.mul_const_vec(prod, gscale[lo:hi],
                                             prod.scale))
        o = ev.add_const_vec(o, beta[lo:hi])
        od, xd = ma.seq(o.data, xd)
        outs.append(od)
        out_scale = (o.scale, o.is_ntt)
    data = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return Ciphertext(data, out_scale[0], out_scale[1])


# --------------------------------------------------------------------------
# Softmax over diagonal-packed attention scores
# --------------------------------------------------------------------------

def diag_valid_masks(input_lens, num_x: int, num_row: int, slots: int
                     ) -> np.ndarray:
    """[num_row, slots] 0/1: slot num_x*k+j of diagonal d is valid iff
    row k < len_j and (k+d) mod num_row < len_j (the reference's three
    tracing-vector edge cases, softmax.hpp:340-391, unified)."""
    lens = np.asarray(input_lens)
    masks = np.zeros((num_row, slots))
    for d in range(num_row):
        k = np.arange(num_row)
        col = (k + d) % num_row
        for j in range(len(lens)):
            ok = (k < lens[j]) & (col < lens[j])
            masks[d, num_x * k[ok] + j] = 1.0
    return masks


def softmax_pts(ev: Evaluator, encoder: Encoder, masks: np.ndarray,
                max_val: float, in_scale: float, n_q: int, exp_r: int = 7,
                sum_scale: float | None = None):
    """Pre-encode softmax_diag's two slot-vector plaintexts (-max*masks and
    masks/sum_scale) so they can travel as jit ARGUMENTS instead of being
    baked into the HLO body (pass as ``pts=``)."""
    if sum_scale is None:
        sum_scale = float(masks.shape[0])
    neg_max = encode_plain(ev, encoder, -max_val * masks, in_scale, n_q)
    n_e = n_q - exp_taylor_primes(exp_r)      # level of exp output
    pair = ev.level_pair_scale(n_e)
    mask_pt = encode_plain(ev, encoder, masks / sum_scale, pair, n_e)
    return neg_max, mask_pt


def softmax_diag(ev: Evaluator, encoder: Encoder, x: Ciphertext,
                 masks: np.ndarray, max_val: float,
                 refresh: Callable[[Ciphertext], Ciphertext],
                 sum_scale: float | None = None, inv_iters: int = 16,
                 eps: float = 1e-5, out_n_q: int | None = None,
                 exp_r: int = 7, pts=None) -> Ciphertext:
    """Softmax over num_row diagonal-packed score ciphertexts (leading axis).

    Pipeline (reference: softmax_boot, softmax.hpp:308-580):
      x - max_val (masked, free) -> exp (8 lv) -> mask*(1/sum_scale) (1 lv)
      -> column-sum + eps (free) -> refresh (bootstrap/recrypt the ONE sum
      ciphertext) -> Goldschmidt inverse (iters+1 lv) -> exp * inv (1 lv).

    ``sum_scale`` normalizes the exp-sum into (0, 2) for the inverse;
    defaults to num_row (max possible sum of exp(x-max) <= 1 terms).
    """
    e, s = softmax_exp_sum(ev, encoder, x, masks, max_val,
                           sum_scale=sum_scale, eps=eps, exp_r=exp_r,
                           pts=pts)
    s = refresh(s)
    return softmax_finish(ev, e, s, inv_iters=inv_iters, out_n_q=out_n_q)


def softmax_exp_sum(ev: Evaluator, encoder: Encoder, x: Ciphertext,
                    masks: np.ndarray, max_val: float,
                    sum_scale: float | None = None, eps: float = 1e-5,
                    exp_r: int = 7, pts=None
                    ) -> tuple[Ciphertext, Ciphertext]:
    """Softmax phase 1: (x - max) -> exp -> mask/sum_scale -> column sum
    + eps.  Returns (e, s); ``s`` is the single sum ciphertext the caller
    refreshes (bootstraps) before softmax_finish."""
    R = masks.shape[0]
    if sum_scale is None:
        sum_scale = float(R)
    if pts is None:
        pts = softmax_pts(ev, encoder, masks, max_val, x.scale, x.n_q,
                          exp_r=exp_r, sum_scale=sum_scale)
    neg_max, mask_pt = pts
    x1 = ev.add_plain(x, neg_max)
    e = exp_taylor(ev, x1, r=exp_r)
    assert mask_pt.n_q == e.n_q, (mask_pt.n_q, e.n_q)
    e = ev.rescale_pair(ev.multiply_plain(e, mask_pt))
    s = Ciphertext(_sum_leading(e.data, ev.dev["q"][:e.n_q].reshape(-1, 1)),
                   e.scale, True)
    s = ev.add_const(s, eps / sum_scale)
    return e, s


def softmax_finish(ev: Evaluator, e: Ciphertext, s: Ciphertext,
                   inv_iters: int = 16, out_n_q: int | None = None
                   ) -> Ciphertext:
    """Softmax phase 2: Goldschmidt inverse of the (refreshed) sum, then
    the final exp * inv multiply."""
    inv = inverse_goldschmidt(ev, s, inv_iters)
    en, invn = ev.align(e, inv)
    out = ev.mul_relin_rescale(
        en, invn.with_data(jnp.broadcast_to(invn.data[None], en.data.shape)))
    if out_n_q is not None and out.n_q > out_n_q:
        out = ev.mod_drop_to(out, out_n_q)
    return out
