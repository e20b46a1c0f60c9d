"""Pallas TPU kernel: negacyclic NTT/INTT as exact int8 MXU matmuls.

The flagship device kernel (SURVEY.md §7.2 step 2; replaces the hot loop
of SEAL's Harvey butterflies, thirdparty/SEAL-4.1-bs/native/src/seal/util/
ntt.h:195-266).  The jnp 4-step path (ntt.py) round-trips HBM on every
butterfly stage (~16 passes over the array); this kernel keeps one
(n1, n2) tile per (batch, limb) VMEM-resident and evaluates the two
axis DFTs as *matrix multiplies* on the MXU:

    Y[k2, k1] = sum_{j2} W2[k2, j2] * T[k1, j2] * sum_{j1} W1[k1, j1] X[j1, j2]

with W1[k1, j1] = w^(n2 j1 k1), W2[k2, j2] = w^(n1 j2 k2), T = w^(k1 j2)
(the same factorization ntt.py uses, natural order in and out, no
bit-reversal).  Exactness: operands are decomposed into 4 balanced
signed 8-bit digits; each int8 x int8 -> int32 dot_general is exact
(|sum| <= n1 * 4 * 128^2 < 2^31), and the 7 digit buckets are folded
mod q with one Montgomery multiply each (modmat.py uses the same trick
for CPMM).

Montgomery convention: x arrives in Montgomery form (xR); the W digit
planes hold *plain* residues, so the contraction preserves the R factor;
bucket constants are 2^(8k) * R mod q so folding is a true multiply.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mod_arith as ma

NDIG = 4
U32 = jnp.uint32


def _host_balanced_digits(x: np.ndarray) -> np.ndarray:
    """uint32/uint64 [..., ] -> int8 [NDIG, ...] with x = sum 2^(8k) d_k."""
    digs = np.empty((NDIG,) + x.shape, dtype=np.int8)
    cur = x.astype(np.int64)
    for k in range(NDIG):
        d = cur & 0xFF
        carry = d > 127
        d = np.where(carry, d - 256, d)
        cur = (cur >> 8) + carry
        digs[k] = d.astype(np.int8)
    assert np.all(cur == 0)
    return digs


def _dft_matrix(omega: int, n: int, step: int, q: int, inverse: bool
                ) -> np.ndarray:
    """[n, n] uint32 with M[k, j] = w^(j*k), w = omega^(+-step) of order n."""
    from .primes import inv_mod
    w = pow(omega, step, q)
    if inverse:
        w = inv_mod(w, q)
    pows = np.empty(n, dtype=np.uint32)
    cur = 1
    for j in range(n):
        pows[j] = cur
        cur = cur * w % q
    idx = np.arange(n, dtype=np.int64)
    return pows[np.outer(idx, idx) % n]


class PallasNttTables:
    """Per-context tables for the Pallas kernel, built from NttTables."""

    def __init__(self, nt):
        self.N = N = nt.N
        self.n1, self.n2 = n1, n2 = nt.n1, nt.n2
        qs = nt.qs
        L = len(qs)
        self.L = L

        # The negacyclic psi twist and the 1/N untwist are SEPARABLE over
        # the (j1, j2) tile: psi^(j1*n2+j2) = A[j1] * B[j2].  A folds into
        # the (plain-residue) axis-1 DFT matrices, B into the (Montgomery)
        # mid twiddle tiles — removing one full elementwise Montgomery
        # multiply from each kernel (they are VPU-bound).
        from .primes import inv_mod
        w1 = np.empty((L, NDIG, n1, n1), np.int8)
        w2 = np.empty((L, NDIG, n2, n2), np.int8)
        w1i = np.empty((L, NDIG, n1, n1), np.int8)
        w2i = np.empty((L, NDIG, n2, n2), np.int8)
        mid = np.empty((L, n1, n2), np.uint32)
        mid_inv_T = np.empty((L, n2, n1), np.uint32)
        for i, q in enumerate(qs):
            psi = int(nt.psi[i])
            omega = psi * psi % q
            j1 = np.arange(n1, dtype=object)
            j2 = np.arange(n2, dtype=object)
            A = np.array([pow(psi, int(j) * n2, q) for j in j1],
                         dtype=np.uint64)                     # psi^(j1 n2)
            B = np.array([pow(psi, int(j), q) for j in j2],
                         dtype=np.uint64)                     # psi^j2
            psi_inv = inv_mod(psi, q)
            n_inv = inv_mod(N % q, q)
            Ai = np.array([pow(psi_inv, int(j) * n2, q) * n_inv % q
                           for j in j1], dtype=np.uint64)     # / N folded
            Bi = np.array([pow(psi_inv, int(j), q) for j in j2],
                          dtype=np.uint64)
            m1 = _dft_matrix(omega, n1, n2, q, False).astype(np.uint64)
            m1i = _dft_matrix(omega, n1, n2, q, True).astype(np.uint64)
            # fwd: contract j1 (columns of W1) — fold A into columns;
            # inv: output rows are j1 — fold Ai into rows
            w1[i] = _host_balanced_digits((m1 * A[None, :] % q))
            w2[i] = _host_balanced_digits(_dft_matrix(omega, n2, n1, q,
                                                      False))
            w1i[i] = _host_balanced_digits((m1i * Ai[:, None] % q))
            w2i[i] = _host_balanced_digits(_dft_matrix(omega, n2, n1, q,
                                                       True))
            # mid tiles: combined constant in PLAIN residue form + Shoup
            # companion — the kernel applies them with shoup_mul (~6 VPU
            # multiplies vs Montgomery's ~9); a plain multiplier preserves
            # the Montgomery factor the data carries.  (q < 2^30 so
            # uint64 products below are exact.)
            mid[i] = (nt.w_mid_pl[i].astype(np.uint64)
                      * B[None, :] % q).astype(np.uint32)
            mid_inv_T[i] = (np.swapaxes(nt.w_mid_inv_pl[i], -1, -2
                                        ).astype(np.uint64)
                            * Bi[:, None] % q).astype(np.uint32)
        self.w1_dig, self.w2_dig = w1, w2
        self.w1i_dig, self.w2i_dig = w1i, w2i
        self.mid_tile = mid                           # [L, n1, n2] plain
        self.mid_inv_tile_T = mid_inv_T               # [L, n2, n1] plain
        self.mid_shoup = np.empty_like(mid)
        self.mid_inv_shoup_T = np.empty_like(mid_inv_T)
        for i, q in enumerate(qs):
            # w < 2^30 so (w << 32) fits uint64 exactly
            self.mid_shoup[i] = ((mid[i].astype(np.uint64) << 32)
                                 // q).astype(np.uint32)
            self.mid_inv_shoup_T[i] = ((mid_inv_T[i].astype(np.uint64)
                                        << 32) // q).astype(np.uint32)

        # bucket fold constants: 2^(8k) mod q as plain Shoup multipliers
        # and a multiple-of-q offset making each int32 bucket non-negative.
        nb = 2 * NDIG - 1
        pairs = [min(k + 1, nb - k) for k in range(nb)]  # digit pairs per k
        self.fold_mul = np.empty((L, nb), np.uint32)
        self.fold_shoup = np.empty((L, nb), np.uint32)
        self.fold_off = np.empty((L, nb), np.uint32)
        nmax = max(n1, n2)
        for i, q in enumerate(qs):
            for k in range(nb):
                w = (1 << (8 * k)) % q
                self.fold_mul[i, k] = w
                self.fold_shoup[i, k] = ma.host_shoup(w, q)
                m = pairs[k] * nmax * 128 * 128       # |bucket| bound
                self.fold_off[i, k] = (m // q + 1) * q
        self.q = nt.q
        self.qneg_inv = nt.qneg_inv

    def device(self) -> dict:
        return {
            "w1_dig": jnp.asarray(self.w1_dig),
            "w2_dig": jnp.asarray(self.w2_dig),
            "w1i_dig": jnp.asarray(self.w1i_dig),
            "w2i_dig": jnp.asarray(self.w2i_dig),
            "mid_tile": jnp.asarray(self.mid_tile),
            "mid_shoup": jnp.asarray(self.mid_shoup),
            "mid_inv_tile_T": jnp.asarray(self.mid_inv_tile_T),
            "mid_inv_shoup_T": jnp.asarray(self.mid_inv_shoup_T),
            # per-limb scalar tables as [L, 1, k] so SMEM blocks (1, 1, k)
            # match the trailing array dims exactly (Mosaic block rule)
            "fold_mul": jnp.asarray(self.fold_mul)[:, None, :],
            "fold_shoup": jnp.asarray(self.fold_shoup)[:, None, :],
            "fold_off": jnp.asarray(self.fold_off)[:, None, :],
            "q": jnp.asarray(self.q).reshape(-1, 1, 1),
            "qneg_inv": jnp.asarray(self.qneg_inv).reshape(-1, 1, 1),
            "meta": (self.N, self.n1, self.n2, self.L),
        }


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on loaded jnp values)
# ---------------------------------------------------------------------------

def _k_mul_full(a, b):
    """Exact 32x32 -> (hi, lo) uint32 via 16-bit halves."""
    M = jnp.uint32(0xFFFF)
    al, ah = a & M, a >> 16
    bl, bh = b & M, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    mid_c = (mid < lh).astype(U32)
    lo = ll + (mid << 16)
    lo_c = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_c << 16) + lo_c
    return hi, lo


def _k_mont_mul(a, b, q, qneg):
    hi, lo = _k_mul_full(a, b)
    m = lo * qneg
    mq_hi, _ = _k_mul_full(m, q)
    res = hi + mq_hi + (lo != 0).astype(U32)
    return jnp.where(res >= q, res - q, res)


def _k_mul_hi(a, b):
    """High 32 bits of the exact 32x32 product (drops the lo path of
    _k_mul_full but keeps its carry into hi)."""
    M = jnp.uint32(0xFFFF)
    al, ah = a & M, a >> 16
    bl, bh = b & M, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    mid_c = (mid < lh).astype(U32)
    lo_c = ((ll >> 16) + (mid & M)) >> 16     # carry out of lo = ll+(mid<<16)
    return hh + (mid >> 16) + (mid_c << 16) + lo_c


def _k_shoup_mul(x, w, ws, q):
    """x*w mod q for precomputed plain w < q with companion ws =
    floor(w*2^32/q): ~6 VPU multiplies vs Montgomery's ~9
    (mod_arith.shoup_mul; SEAL's multiply_uint_mod const-operand path)."""
    hi = _k_mul_hi(x, ws)
    r = x * w - hi * q                        # wrapping, exact in [0, 2q)
    return jnp.where(r >= q, r - q, r)


def _k_digits(x):
    """uint32 [r, c] -> 4 int8 planes (balanced)."""
    digs = []
    cur = x
    for _ in range(NDIG):
        d = (cur & jnp.uint32(0xFF)).astype(jnp.int32)
        carry = d > 127
        d = jnp.where(carry, d - 256, d)
        cur = (cur >> 8) + carry.astype(U32)
        digs.append(d.astype(jnp.int8))
    return digs


def _k_mod_matmul(wd, xd, q, fold_mul, fold_shoup, fold_off, cdim: int):
    """Exact modular matmul over digit planes, folding bucket-by-bucket
    (bounded VMEM: one int32 bucket live at a time).

    wd: int8 [NDIG, n_out, n] digit planes of plain residues W.
    xd: list of NDIG int8 planes [bt, ..., n at axis ``cdim``].
    Contraction: W axis 1 against x axis ``cdim``; result
    [n_out, *x_other_axes] uint32 mod q, preserving any Montgomery
    factor carried by x.  Bucket folds are Shoup multiplies by the plain
    constant 2^(8k) mod q (the folds are the kernel's VPU bottleneck —
    BENCH_NOTES r4; Shoup cuts each from ~9 to ~6 VPU multiplies).
    """
    nb = 2 * NDIG - 1
    dims = (((1,), (cdim,)), ((), ()))
    acc = None
    for k in range(nb):
        part = None
        for a in range(NDIG):
            b = k - a
            if b < 0 or b >= NDIG:
                continue
            t = jax.lax.dot_general(wd[a], xd[b], dimension_numbers=dims,
                                    preferred_element_type=jnp.int32)
            part = t if part is None else part + t
        u = part.astype(U32) + fold_off[k]
        term = _k_shoup_mul(u, fold_mul[k], fold_shoup[k], q)
        acc = term if acc is None else \
            jnp.where((s := acc + term) >= q, s - q, s)
    return acc


# ---------------------------------------------------------------------------
# kernels — per grid cell: bt batch rows x 1 limb, VMEM-resident
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w1_ref, w2_ref, mid_ref, mids_ref, fm_ref, fs_ref,
                fo_ref, q_ref, qneg_ref, out_ref, *, n1, n2, bt):
    q = q_ref[0, 0, 0]
    nb = 2 * NDIG - 1
    fm = [fm_ref[0, 0, k] for k in range(nb)]     # SMEM: scalar loads only
    fs = [fs_ref[0, 0, k] for k in range(nb)]
    fo = [fo_ref[0, 0, k] for k in range(nb)]
    # bt batch rows per grid cell, each processed as a 2D tile (Mosaic has
    # no 3D transpose; looping 2D slices keeps the MXU fed and amortizes
    # the per-cell weight-tile residency).  The psi twist is folded into
    # W1/mid host-side (separable over the tile) — no twist multiply here.
    for b in range(bt):
        x = x_ref[b, 0]                                        # [n1, n2]
        a = _k_mod_matmul(w1_ref[0], _k_digits(x), q, fm, fs, fo, 0)
        a = _k_shoup_mul(a, mid_ref[0], mids_ref[0], q)
        y = _k_mod_matmul(w2_ref[0], _k_digits(a), q, fm, fs, fo, 1)
        out_ref[b, 0] = y                                      # [n2, n1]


def _inv_kernel(x_ref, w2i_ref, w1i_ref, midinv_ref, midinvs_ref, fm_ref,
                fs_ref, fo_ref, q_ref, qneg_ref, out_ref, *, n1, n2, bt):
    q = q_ref[0, 0, 0]
    nb = 2 * NDIG - 1
    fm = [fm_ref[0, 0, k] for k in range(nb)]     # SMEM: scalar loads only
    fs = [fs_ref[0, 0, k] for k in range(nb)]
    fo = [fo_ref[0, 0, k] for k in range(nb)]
    # psi^-1/N untwist folded into W1i/midinv host-side
    for b in range(bt):
        y = x_ref[b, 0]                                        # [n2, n1]
        t = _k_mod_matmul(w2i_ref[0], _k_digits(y), q, fm, fs, fo, 0)
        t = _k_shoup_mul(t, midinv_ref[0], midinvs_ref[0], q)
        x = _k_mod_matmul(w1i_ref[0], _k_digits(t), q, fm, fs, fo, 1)
        out_ref[b, 0] = x                                      # [n1, n2]


def _call(kernel, B, bt, Lact, lo, mat_shapes, in_tile, out_tile,
          interpret):
    """Build the pallas_call for x tiles [B, Lact, *in_tile] -> output
    tiles [B, Lact, *out_tile], bt batch rows per grid cell.

    Grid order is (limb, batch) with batch INNERMOST: the per-limb weight
    and twiddle blocks have batch-independent index maps, so Pallas skips
    re-fetching them across the whole batch sweep — they are ~5x the x
    tile's bytes at N=2^15, so batch-inner order removes most of the
    kernel's HBM traffic.  ``mat_shapes``: trailing block shapes for the
    4 per-limb matrix inputs, in argument order.  Limb tables are indexed
    at absolute limb lo + l; scalar tables live in SMEM."""
    nb = 2 * NDIG - 1
    grid = (Lact, B // bt)

    def limb(blk, space=pltpu.VMEM):
        def idx(l, b):
            return (l + lo,) + (0,) * len(blk)
        return pl.BlockSpec((1,) + blk, idx, memory_space=space)

    in_specs = [
        pl.BlockSpec((bt, 1) + in_tile, lambda l, b: (b, l, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [limb(s) for s in mat_shapes] + [
        limb((1, nb), pltpu.SMEM),        # fold_mul
        limb((1, nb), pltpu.SMEM),        # fold_shoup
        limb((1, nb), pltpu.SMEM),        # fold_off
        limb((1, 1), pltpu.SMEM),         # q
        limb((1, 1), pltpu.SMEM),         # qneg_inv
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, 1) + out_tile,
                               lambda l, b: (b, l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lact) + out_tile, jnp.uint32),
        interpret=interpret,
    )


def _batch_tile(B: int, n1: int, n2: int) -> int:
    """Batch rows per grid cell (in-kernel 2D loop).  Bounded by an ~8 MB
    VMEM budget for the x/out tiles; override via MOAI_PALLAS_BT."""
    import os
    want = int(os.environ.get("MOAI_PALLAS_BT", "4"))
    budget = max(1, (8 << 20) // (n1 * n2 * 16))
    bt = 1
    for cand in (2, 4, 8):
        if cand <= want and B % cand == 0 and cand <= budget:
            bt = cand
    return bt


def ntt_pallas(x, tbp: dict, limb_slice=None, interpret: bool = False):
    """Forward negacyclic NTT via the Pallas kernel.  Same contract as
    ntt.ntt: x [..., Lact, N] uint32 Montgomery -> NTT values at index k
    <-> root exponent 2k+1, natural order."""
    N, n1, n2, L = tbp["meta"]
    lo = 0 if limb_slice is None else limb_slice[0]
    lead = x.shape[:-2]
    Lact = x.shape[-2]
    x2 = x.reshape((-1, Lact, n1, n2))
    bt = _batch_tile(x2.shape[0], n1, n2)
    fn = _call(functools.partial(_fwd_kernel, n1=n1, n2=n2, bt=bt),
               x2.shape[0], bt, Lact, lo,
               [(NDIG, n1, n1), (NDIG, n2, n2), (n1, n2), (n1, n2)],
               (n1, n2), (n2, n1), interpret)
    out = fn(x2, tbp["w1_dig"], tbp["w2_dig"],
             tbp["mid_tile"], tbp["mid_shoup"], tbp["fold_mul"],
             tbp["fold_shoup"], tbp["fold_off"],
             tbp["q"], tbp["qneg_inv"])
    return out.reshape(lead + (Lact, N))


def intt_pallas(x, tbp: dict, limb_slice=None, interpret: bool = False):
    """Inverse negacyclic NTT via the Pallas kernel (inverse of
    ntt_pallas, including the 1/N factor)."""
    N, n1, n2, L = tbp["meta"]
    lo = 0 if limb_slice is None else limb_slice[0]
    lead = x.shape[:-2]
    Lact = x.shape[-2]
    x2 = x.reshape((-1, Lact, n2, n1))
    bt = _batch_tile(x2.shape[0], n1, n2)
    fn = _call(functools.partial(_inv_kernel, n1=n1, n2=n2, bt=bt),
               x2.shape[0], bt, Lact, lo,
               [(NDIG, n2, n2), (NDIG, n1, n1), (n2, n1), (n2, n1)],
               (n2, n1), (n1, n2), interpret)
    out = fn(x2, tbp["w2i_dig"], tbp["w1i_dig"], tbp["mid_inv_tile_T"],
             tbp["mid_inv_shoup_T"], tbp["fold_mul"], tbp["fold_shoup"],
             tbp["fold_off"], tbp["q"], tbp["qneg_inv"])
    return out.reshape(lead + (Lact, N))
