"""Exact modular matmul over ciphertext batches — the MXU path.

The reference's CPMM (reference: include/source/matrix_mul/
Ct_pt_matrix_mul.hpp:4-215) computes out[i] = sum_j ct[j] * w[j,i] as 768
scalar ciphertext multiplies per output column under OpenMP.  On TPU the
whole contraction is one *integer matmul per limb*:

    out[i, l, n] = sum_j x[j, l, n] * w[j, i]   (mod q_l)

computed exactly by decomposing both operands into balanced signed 8-bit
digits and issuing int8 x int8 -> int32 dot_generals (the MXU's native
integer path; exact because |sum_j d_x * d_w| <= J * 128 * 128 < 2^31).
Digit-bucket partial sums are folded back mod q with one Montgomery
multiply per bucket.

x stays in Montgomery form throughout (Montgomery is linear, so the
contraction of Montgomery x against plain w digits yields the Montgomery
form of the result).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from . import mod_arith as ma

NDIG = 4          # 8-bit digits covering < 2^32
MAX_J = 8192      # keeps |digit dot| < 2^27 (J * 128 * 128)


def _balanced_digits_u32(x):
    """uint32 [..., ] -> int8 digits [NDIG, ...] with x = sum 2^(8k) d_k,
    d_k in [-128, 127] (vectorized, exact)."""
    digs = []
    cur = x.astype(jnp.uint32)
    for _ in range(NDIG):
        d = (cur & jnp.uint32(0xFF)).astype(jnp.int32)
        carry = d > 127
        d = jnp.where(carry, d - 256, d)
        cur = (cur >> 8) + carry.astype(jnp.uint32)
        digs.append(d.astype(jnp.int8))
    return jnp.stack(digs)


def host_weight_digits(w_res: np.ndarray) -> np.ndarray:
    """Host: residues uint32 [L, J, I] -> balanced int8 digits [NDIG, L, J, I]."""
    digs = np.empty((NDIG,) + w_res.shape, dtype=np.int8)
    cur = w_res.astype(np.int64)
    for k in range(NDIG):
        d = cur & 0xFF
        carry = d > 127
        d = np.where(carry, d - 256, d)
        cur = (cur >> 8) + carry
        digs[k] = d.astype(np.int8)
    assert np.all(cur == 0)
    return digs


def host_bucket_consts(qs: list[int]):
    """Per-bucket fold constants.

    Returns (bucket_mul [2*NDIG-1, L] uint32, bucket_off [L] uint32):
    bucket_mul[k] = 2^(8k) * R mod q (so one Montgomery multiply folds an
    int32 bucket sum into the accumulator); bucket_off is a multiple of q in
    [2^28, 2^31) added to shift possibly-negative bucket sums into uint32
    range (it vanishes mod q).
    """
    nb = 2 * NDIG - 1
    L = len(qs)
    cmul = np.empty((nb, L), dtype=np.uint32)
    offset = np.empty(L, dtype=np.uint32)
    M = 1 << 28                                   # > max |bucket sum| (2^27)
    for li, q in enumerate(qs):
        for k in range(nb):
            cmul[k, li] = (1 << (8 * k)) * (1 << 32) % q
        offset[li] = (M // q + 1) * q             # multiple of q, in [M, M+q)
    return cmul, offset


def mod_matmul(x, w_digits, bucket_mul, bucket_off, q, qneg):
    """x: uint32 [..., J, P, L, N] Montgomery;  w_digits: int8 [NDIG, L, J, I];
    returns uint32 [..., I, P, L, N] Montgomery = sum_j x_j * w_ji mod q_l.

    q, qneg: [L] per-limb constants.  bucket_mul: [2*NDIG-1, L] uint32;
    bucket_off: [L] uint32 (the multiple-of-q shift making sums positive).
    """
    J = x.shape[-4]
    assert J <= MAX_J, J
    xd = _balanced_digits_u32(x)                  # [NDIG, ..., J, P, L, N]
    q4 = q.reshape(-1, 1)
    qneg4 = qneg.reshape(-1, 1)
    nb = 2 * NDIG - 1
    acc = None
    off = bucket_off.reshape(-1, 1)
    # bucket-outer loop: exactly ONE [I, P, L, N] int32 bucket is live at a
    # time (a bucket is folded into the uint32 accumulator before the next
    # one is built) — bounds peak HBM at d_model=768 x 32-limb scale
    for k in range(nb):
        part = None
        for dx in range(max(0, k - NDIG + 1), min(NDIG, k + 1)):
            dw = k - dx
            # contraction over j with per-limb batch: 'jpln,lji->ipln'
            term = jnp.einsum(
                "...jpln,lji->...ipln", xd[dx], w_digits[dw],
                preferred_element_type=jnp.int32)
            part = term if part is None else part + term
        # shift into non-negative uint32 (bucket_off is a multiple of q)
        u = (part.astype(jnp.uint32) + off)
        fold = ma.mont_mul(u, bucket_mul[k].reshape(-1, 1), q4, qneg4)
        acc = fold if acc is None else ma.add_mod(acc, fold, q4)
        # sequence the buckets: without this barrier XLA schedules all
        # bucket einsums concurrently (k x 1.5 GB int32 temps at n15 dims)
        acc, xd = ma.seq(acc, xd)
    return acc
