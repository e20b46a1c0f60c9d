"""uint32 modular arithmetic for RNS limbs — the TPU-native substrate.

Replaces SEAL's 64-bit word arithmetic (reference:
thirdparty/SEAL-4.1-bs/native/src/seal/util/uintarith.h,
util/uintarithsmallmod.h).  TPUs have no native 64-bit integer multiply, so
this framework works with primes q < 2**30 and keeps every residue in one
uint32 lane.  A modular multiply is a Montgomery REDC built from four exact
16-bit-digit products — ~9 int32 VPU multiplies, fully vectorized over
``[..., n_limbs, N]`` arrays.

Representation convention: all *device-resident* polynomial data (ciphertext
limbs, keys, plaintexts, twiddle tables) is stored in **Montgomery form**
(x·R mod q, R = 2**32).  ``mont_mul`` is then closed: mm(xR, yR) = xyR.
Additions are representation-agnostic.  True values are materialised only at
RNS base-conversion boundaries via ``from_mont``.

Per-limb constants are passed with shape ``[n_limbs, 1]`` (broadcast against
``[..., n_limbs, N]`` data).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# host-side Montgomery constants
# ---------------------------------------------------------------------------

def mont_constants(q: int) -> dict:
    """Compute Montgomery constants for one odd prime q < 2**30."""
    assert q % 2 == 1 and q < (1 << 30)
    r = 1 << 32
    qinv = pow(q, -1, r)
    return {
        "q": q,
        "qneg_inv": (r - qinv) % r,       # -q^{-1} mod 2^32
        "r2": (r * r) % q,                # R^2 mod q (to-Montgomery factor)
        "r1": r % q,                      # R mod q   (Montgomery form of 1)
    }


def host_to_mont(x: int, q: int) -> int:
    """Montgomery form of integer x (host, exact)."""
    return (x % q) * (1 << 32) % q


def host_from_mont(x: int, q: int) -> int:
    return x * pow(1 << 32, -1, q) % q


# ---------------------------------------------------------------------------
# device-side primitives (pure jnp on uint32; shapes broadcast)
# ---------------------------------------------------------------------------

def mul_full_u32(a, b):
    """Exact 32x32 -> 64 product as (hi, lo) uint32 pair.

    Valid for arbitrary uint32 inputs; wrapping uint32 ops with explicit
    carry recovery (TPU VPU has no widening multiply).
    """
    a = a.astype(U32)
    b = b.astype(U32)
    al = a & MASK16
    ah = a >> 16
    bl = b & MASK16
    bh = b >> 16
    ll = al * bl                      # exact, < 2^32
    lh = al * bh                      # exact, < 2^32
    hl = ah * bl                      # exact, < 2^32
    hh = ah * bh                      # exact, < 2^32
    mid = lh + hl                     # may wrap
    mid_carry = (mid < lh).astype(U32)            # wrapped => +2^32 at bit 16 => +2^16 in hi
    lo = ll + (mid << 16)                         # may wrap
    lo_carry = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


def mont_redc(t_hi, t_lo, q, qneg_inv):
    """REDC: (t_hi*2^32 + t_lo) * R^{-1} mod q, result in [0, q).

    Requires t < R*q, which holds for any product of uint32 by a value < q.
    """
    m = t_lo * qneg_inv                           # wrapping mul
    mq_hi, _mq_lo = mul_full_u32(m, q)
    carry = (t_lo != 0).astype(U32)               # (t_lo + mq_lo) carries iff t_lo != 0
    res = t_hi + mq_hi + carry                    # < 2q < 2^31, no overflow
    return jnp.where(res >= q, res - q, res)


def mont_mul(a, b, q, qneg_inv):
    """Montgomery product: mm(xR, yR) = xyR mod q, in [0, q)."""
    hi, lo = mul_full_u32(a, b)
    return mont_redc(hi, lo, q, qneg_inv)


def host_shoup(w: int, q: int) -> int:
    """Shoup companion floor(w * 2^32 / q) for a precomputed multiplier
    w < q (host, exact)."""
    return (w << 32) // q


def shoup_mul(x, w, w_shoup, q):
    """x * w mod q for a PRECOMPUTED multiplier w < q with Shoup companion
    w_shoup = floor(w * 2^32 / q) (host_shoup).  ~6 VPU multiplies instead
    of Montgomery's ~9 (SEAL uses the same trick for twiddles/keys,
    util/uintarithsmallmod.h multiply_uint_mod<const>).

    Math: with h = floor(x*w_shoup / 2^32), q*h is within (xw - 2q, xw],
    so r = x*w - h*q (computed wrapping uint32 — exact because r < 2q <
    2^31) needs one conditional subtract.  Result preserves whatever
    representation factor x carries (w is applied as a TRUE multiplier):
    Montgomery-form x stays Montgomery."""
    hi, _lo = mul_full_u32(x, w_shoup)
    r = x * w - hi * q                            # wrapping, exact in [0,2q)
    return jnp.where(r >= q, r - q, r)


def to_mont(x, q, qneg_inv, r2):
    """Convert true residues (any uint32, even >= q) to Montgomery form."""
    return mont_mul(x.astype(U32), r2, q, qneg_inv)


def from_mont(x, q, qneg_inv):
    """Montgomery form -> true residue in [0, q)."""
    return mont_redc(jnp.zeros_like(x, dtype=U32), x.astype(U32), q, qneg_inv)


def seq(*trees):
    """Force SEQUENTIAL scheduling of chunked accumulation loops.

    XLA's TPU scheduler freely reorders independent subgraphs for
    parallelism; a Python loop of independent chunk computations folded
    into an accumulator therefore materializes EVERY chunk's temporaries
    at once (observed: a 102 GB schedule for a 7-bucket modular matmul on
    a 16 GB chip).  Threading the accumulator AND the shared inputs
    through an optimization_barrier after each chunk makes iteration k+1
    data-depend on iteration k, restoring the loop's memory profile.
    Returns the trees unchanged (identity at runtime).
    """
    import jax
    out = jax.lax.optimization_barrier(trees)
    return out if len(trees) > 1 else out[0]


def add_mod(a, b, q):
    s = a + b                                     # < 2^31, no wrap
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    d = a - b                                     # wraps for a < b
    return jnp.where(a >= b, d, d + q)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)
