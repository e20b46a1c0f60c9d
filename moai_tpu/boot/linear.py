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
                    diags: dict[int, np.ndarray], scale: float | None = None
                    ) -> Ciphertext:
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
            pt = _encode_pt(ev, encoder, vec, scale, ct.n_q)
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


def _encode_pt(ev, encoder, vec, scale, n_q):
    res = encoder.encode(vec, scale=scale, n_q=n_q)
    mont = _to_mont_host(res, ev.ctx.q_primes[:n_q])
    return Plaintext(data=ntt(jnp.asarray(mont), ev.tbd,
                              limb_slice=(0, n_q)), scale=scale)


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
