"""Homomorphic linear transforms: BSGS diagonal apply + CoeffToSlot /
SlotToCoeff matrices.

TPU-native counterpart of the reference's bootstrap linear-transform
machinery (reference: include/source/bootstrapping/Bootstrapper.cpp:
genorigcoeff :522, genfftcoeff_3 :1144, geninvfftcoeff_3 :1552,
bsgs_linear_transform :1997, coefftoslot_full_3 :2742, slottocoeff_full_3
:2760).  Differences:

- A transform level is a *generic* complex matrix given by its nonzero
  diagonals; CoeffToSlot/SlotToCoeff are built numerically from the
  encoder's canonical-embedding map (host numpy), either dense (one
  level) or radix-factored (multi level), instead of hand-derived FFT
  coefficient formulas.
- The BSGS apply uses ONE hoisted decomposition for all baby rotations
  (Halevi-Shoup), and giant-step rotations on partial sums; diagonal
  plaintexts are encoded at exactly the pair scale so one level is
  consumed per transform level.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import mod_arith as ma
from ..ciphertext import Ciphertext, Plaintext
from ..evaluator import Evaluator
from ..encoder import Encoder
from ..keys import _to_mont_host
from ..ntt import ntt


def matrix_diagonals(M: np.ndarray) -> dict[int, np.ndarray]:
    """Dense [n, n] complex matrix -> {d: diag_d[n]} with
    (M v)_i = sum_d diag_d[i] * v[(i+d) mod n]; zero diagonals dropped."""
    n = M.shape[0]
    out = {}
    idx = np.arange(n)
    for d in range(n):
        diag = M[idx, (idx + d) % n]
        if np.max(np.abs(diag)) > 1e-14:
            out[d] = diag
    return out


def bsgs_steps(diag_indices, n: int) -> list[int]:
    """Rotation steps the BSGS apply needs for these diagonals."""
    g = max(1, int(np.ceil(np.sqrt(len(diag_indices)))))
    babies = set()
    giants = set()
    for d in diag_indices:
        babies.add(d % g)
        giants.add(d - d % g)
    steps = {s for s in babies if s} | {s for s in giants if s}
    return sorted(steps)


def apply_diagonals(ev: Evaluator, encoder: Encoder, ct: Ciphertext,
                    diags: dict[int, np.ndarray], scale: float | None = None,
                    pt_source=None) -> Ciphertext:
    """Homomorphic M @ slots(ct) via BSGS over the nonzero diagonals.

    rot(v, s) here is the slot rotation (i -> v[(i+s) mod n]), matching
    Evaluator.rotate.  Baby steps use one hoisted decomposition; giant
    steps rotate the combined partial sums, with the plaintext diagonals
    pre-rotated on host (Halevi-Shoup; the reference's
    bsgs_linear_transform, Bootstrapper.cpp:1997).
    Consumes one composite level.
    """
    n = encoder.slots
    idxs = sorted(diags.keys())
    g = max(1, int(np.ceil(np.sqrt(len(idxs)))))
    pair = ev.level_pair_scale(ct.n_q)
    scale = scale if scale is not None else pair
    groups: dict[int, list[int]] = {}
    for d in idxs:
        groups.setdefault(d - d % g, []).append(d)
    baby_set = sorted({d % g for d in idxs})
    rot = {0: ct}
    nonzero = [s for s in baby_set if s]
    if nonzero:
        hoisted = ev.rotate_hoisted(ct, nonzero)
        for i, s in enumerate(nonzero):
            rot[s] = Ciphertext(hoisted.data[i], hoisted.scale, True)
    total = None
    for gi, ds in sorted(groups.items()):
        part = None
        for d in ds:
            # pre-rotate the diagonal by -gi so the giant rotation fixes it
            vec = np.roll(diags[d], gi)
            pt = _encode_pt(ev, encoder, vec, scale, ct.n_q) \
                if pt_source is None else pt_source(vec, scale, ct.n_q)
            term = ev.multiply_plain(rot[d % g], pt)
            part = term if part is None else \
                Ciphertext(ma.add_mod(part.data, term.data,
                                      ev.dev["q"][:term.n_q].reshape(-1, 1)),
                           term.scale, True)
        if gi:
            part = ev.rotate(part, gi)
        total = part if total is None else \
            Ciphertext(ma.add_mod(total.data, part.data,
                                  ev.dev["q"][:part.n_q].reshape(-1, 1)),
                       part.scale, True)
    return ev.rescale_pair(total)


def _pt_ntt(ev, mont, n_q):
    """Jitted plaintext NTT (one executable per n_q): the eager 4-step
    is ~40 separate device dispatches — minutes per LT collection on the
    tunneled TPU.

    Uses the jnp 4-step (Pallas stripped): LT plaintexts are encoded once
    at setup so kernel speed is irrelevant, and the Pallas kernel cannot
    be traced under the jax.eval_shape collection pass (its kernel
    closure captures the scalar tables as constants there)."""
    import jax
    cache = ev.__dict__.setdefault("_pt_ntt_jits", {})
    fn = cache.get(n_q)
    if fn is None:
        tbd = {k: v for k, v in ev.tbd.items() if k != "pallas"}
        fn = jax.jit(lambda x: ntt(x, tbd, limb_slice=(0, n_q)))
        cache[n_q] = fn
    return fn(mont)


def _encode_pt(ev, encoder, vec, scale, n_q):
    res = encoder.encode(vec, scale=scale, n_q=n_q)
    mont = _to_mont_host(res, ev.ctx.q_primes[:n_q])
    return Plaintext(data=_pt_ntt(ev, jnp.asarray(mont), n_q), scale=scale)


# --------------------------------------------------------------------------
# CoeffToSlot / SlotToCoeff matrices from the canonical embedding
# --------------------------------------------------------------------------

def embedding_matrix(encoder: Encoder) -> np.ndarray:
    """A [n, n] with A[j, k] = zeta^(rot_j * k):  slots(c) = A u for a real
    coefficient vector c = (c_lo | c_hi) packed as u = c_lo + i*c_hi.

    (Because rot_j = 5^j ≡ 1 mod 4, the high-column block is exactly
    i * A_lo, so the N-coefficient embedding collapses to one invertible
    n x n complex map; and A A^H = n I — the rows are orthogonal since
    sum_k zeta^((r_j - r_j')k) telescopes to 0 for j != j' — so the
    inverse is A^H / n, never a numerical inversion.)
    """
    n = encoder.slots
    N = encoder.N
    expo = np.outer(encoder.rot_group % (2 * N), np.arange(n)) % (2 * N)
    return np.exp(1j * np.pi * expo / N)


def c2s_matrix(encoder: Encoder) -> np.ndarray:
    """CoeffToSlot: u = (A^H / n) @ slots — slots become c_lo + i*c_hi
    (reference: coefftoslot_full_3 via 3 FFT factor levels,
    Bootstrapper.cpp:2742; here the full map, applied in one BSGS level)."""
    A = embedding_matrix(encoder)
    return A.conj().T / encoder.slots


def s2c_matrix(encoder: Encoder) -> np.ndarray:
    """SlotToCoeff: slots = A @ u (reference: slottocoeff_full_3,
    Bootstrapper.cpp:2760)."""
    return embedding_matrix(encoder)


# --------------------------------------------------------------------------
# Radix-2 factorization (memory-feasible at full scale)
#
# Dense C2S/S2C needs n diagonal plaintexts — infeasible at n = 2^15.
# The embedding matrix factors by the classic even/odd split: with
# exps[j] = 5^j mod 2N,  exps[j + m/2] = (N+1) * exps[j], so the twiddle of
# the upper half is the negation of the lower's and each split is one
# 2-diagonal butterfly in slot space.  The even/odd column permutations
# accumulate to a bit-reversal Pi that is NEVER applied: CoeffToSlot
# produces coefficients in bit-reversed order, EvalMod is slot-pointwise,
# and SlotToCoeff (same recursion) consumes the same order, so Pi cancels
# inside the bootstrap (the reference's 3-level genfftcoeff_3 /
# geninvfftcoeff_3 coefficients, Bootstrapper.cpp:1144/1552, encode the
# same cancellation).
# --------------------------------------------------------------------------

def _s2c_butterflies(encoder: Encoder) -> list[dict[int, np.ndarray]]:
    """Butterfly factors in MATRIX order:  A = B_0 @ B_1 @ ... @ B_{k-1}
    (up to the column bit-reversal Pi, never materialized); each B is
    {diag_index: vec[n]} with exactly 2 diagonals {0, block/2}."""
    n = encoder.slots
    two_n = 2 * encoder.N
    levels = []
    exps = [np.array(encoder.rot_group % two_n, dtype=np.int64)]
    m = n
    while m > 1:
        m2 = m // 2
        d0 = np.zeros(n, complex)
        dp = np.zeros(n, complex)            # diagonal +m2 (lower rows)
        dm = np.zeros(n, complex)            # diagonal -m2 (upper rows)
        new_exps = []
        for b, e in enumerate(exps):
            base = b * m
            w = np.exp(1j * np.pi * (e[:m2] % two_n) / encoder.N)
            d0[base: base + m2] = 1.0        # B[j, j] = 1
            d0[base + m2: base + m] = -w     # B[j+m2, j+m2] = -w_j
            dp[base: base + m2] = w          # B[j, j+m2] = w_j
            dm[base + m2: base + m] = 1.0    # B[j+m2, j] = 1
            half = 2 * e[:m2] % two_n
            new_exps.extend([half, half.copy()])
        lev = {0: d0}
        if m2 % n == (n - m2) % n:           # first level: +m2 == -m2 mod n
            lev[m2 % n] = dp + dm
        else:
            lev[m2] = dp
            lev[n - m2] = dm
        levels.append(lev)
        exps = new_exps
        m //= 2
    return levels


def _invert_butterfly(lev: dict[int, np.ndarray]) -> dict[int, np.ndarray]:
    """Inverse of one butterfly level (again 3 diagonals {0, +-m2}):
    per block pair, [[1, w],[1, -w]]^-1 = 0.5*[[1, 1],[1/w, -1/w]]."""
    n = len(lev[0])
    m2 = min(d for d in lev if d != 0)
    w_vec = lev[m2]                           # w on lower rows of diag +m2
    inv0 = np.zeros(n, complex)
    invp = np.zeros(n, complex)               # diag +m2 of the inverse
    invm = np.zeros(n, complex)               # diag -m2 of the inverse
    for base in range(0, n, 2 * m2):
        w = w_vec[base: base + m2]
        inv0[base: base + m2] = 0.5           # [j, j]
        invp[base: base + m2] = 0.5           # [j, j+m2]
        invm[base + m2: base + 2 * m2] = 0.5 / w      # [j+m2, j]
        inv0[base + m2: base + 2 * m2] = -0.5 / w     # [j+m2, j+m2]
    out = {0: inv0}
    if m2 % n == (n - m2) % n:
        out[m2] = invp + invm
    else:
        out[m2] = invp
        out[n - m2] = invm
    return out


def s2c_apply_levels(encoder: Encoder) -> list[dict[int, np.ndarray]]:
    """SlotToCoeff factor levels in APPLICATION order (apply list[0]
    first to the ciphertext):  slots = B_0 ... B_{k-1} u_bitrev, so the
    rightmost factor B_{k-1} is applied first."""
    return list(reversed(_s2c_butterflies(encoder)))


def c2s_apply_levels(encoder: Encoder) -> list[dict[int, np.ndarray]]:
    """CoeffToSlot factor levels in APPLICATION order:
    u_bitrev = B_{k-1}^-1 ... B_0^-1 slots — apply B_0^-1 first."""
    return [_invert_butterfly(l) for l in _s2c_butterflies(encoder)]


def compose_diagonals(A: dict, B: dict, n: int) -> dict:
    """Diagonal form of A @ B: (A@B)[i, i+da+db] += A[i,i+da]*B[i+da, ...]."""
    out: dict[int, np.ndarray] = {}
    for da, va in A.items():
        for db, vb in B.items():
            d = (da + db) % n
            term = va * np.roll(vb, -da)
            if d in out:
                out[d] = out[d] + term
            else:
                out[d] = term.copy()
    return {d: v for d, v in out.items() if np.max(np.abs(v)) > 1e-14}


def group_apply_levels(levels: list[dict[int, np.ndarray]], group: int
                       ) -> list[dict[int, np.ndarray]]:
    """Merge ``group`` consecutive APPLICATION-order levels into one
    multi-diagonal level (depth vs diagonal-count tradeoff; the reference
    groups its log n FFT into 3 BSGS levels, Bootstrapper.cpp:1144).
    Application order means later levels multiply from the LEFT."""
    n = len(next(iter(levels[0].values())))
    grouped = []
    for i in range(0, len(levels), group):
        acc = levels[i]
        for j in range(i + 1, min(i + group, len(levels))):
            acc = compose_diagonals(levels[j], acc, n)
        grouped.append(acc)
    return grouped
