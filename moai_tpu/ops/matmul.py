"""Encrypted matrix multiplication: CPMM and CCMM.

TPU-native counterparts of the reference matmul layer:
- CPMM (reference: include/source/matrix_mul/Ct_pt_matrix_mul.hpp:4-215,
  four variants): X (col-packed ciphertext batch) x plaintext W.  The
  reference's per-output-column OpenMP loops of scalar ciphertext
  multiplies become ONE exact integer matmul per limb on the MXU
  (modmat.mod_matmul, int8 digit path), with zero rotations — preserving
  the reference's key insight that column packing makes XW rotation-free.
- CCMM col-packing (reference: Ct_ct_matrix_mul.hpp:5-55): col-packed X x
  col-packed W^T -> diagonal-packed XW^T via rotations by multiples of the
  interleaved-batch factor; rotations are batched over the whole column
  axis (one key-switch per step instead of per (step, column)).
- CCMM diag-packing BSGS (reference: Ct_ct_matrix_mul.hpp:57-155):
  diagonal-packed X x col-packed V with baby-step/giant-step rotations.

Depth accounting matches the reference: each matmul consumes one composite
level.  The masked CPMM variant (reference :103, "w_mask") folds the 0/1
tracing vector in at the same total depth by splitting the pair budget:
weights at the top single prime, mask at the next.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import mod_arith as ma
from ..ciphertext import Ciphertext, Plaintext
from ..evaluator import Evaluator
from ..encoder import Encoder
from ..keys import _to_mont_host
from ..modmat import mod_matmul, host_weight_digits, host_bucket_consts
from ..ntt import ntt


def _bsgs_split(m: int) -> tuple[int, int]:
    g = int(np.ceil(np.sqrt(m)))
    return g, int(np.ceil(m / g))


def ccmm_col_steps(num_x: int, num_row: int) -> list[int]:
    """Rotation steps needed by ccmm_col_to_diag (galois key planning, the
    reference does the same in test_full_scheme.hpp:436-443).  Double-BSGS:
    baby steps s*num_x (s < g), giant steps +-g*bi*num_x (bi < b) — ~3*sqrt
    (num_row) keys instead of the reference's num_row-1."""
    g, b = _bsgs_split(num_row)
    steps = set()
    for s in range(1, g):
        steps.add(s * num_x)
    for bi in range(1, b):
        steps.add(g * bi * num_x)
        steps.add(-g * bi * num_x)
    return sorted(steps)


def ccmm_diag_steps(num_x: int, num_row: int) -> list[int]:
    """Rotation steps needed by ccmm_diag_to_col (BSGS baby+giant+pre)."""
    m = num_row
    g = int(np.ceil(np.sqrt(m)))
    b = int(np.ceil(m / g))
    steps = set()
    for s in range(1, g):
        steps.add(s * num_x)
    for bi in range(1, b):
        steps.add(g * bi * num_x)
        steps.add(-g * bi * num_x)
    return sorted(steps)


class CPMM:
    """Precompiled ct x pt matmul: out[i] = sum_j x[j] * W[j, i] (+ bias).

    W: [J, I] float weights.  ``n_q`` is the level the input arrives at.
    With ``mask`` (the tracing vector over slots) the weights are encoded at
    the top single prime and the mask at the following prime, so the masked
    product still costs exactly one composite level.
    """

    def __init__(self, ev: Evaluator, encoder: Encoder, W: np.ndarray,
                 n_q: int, bias: np.ndarray | None = None,
                 mask: np.ndarray | None = None):
        self.ev = ev
        ctx = ev.ctx
        self.n_q = n_q
        qs = ctx.q_primes[:n_q]
        self.out_dim = W.shape[1]
        if mask is None:
            w_scale = float(qs[-1]) * float(qs[-2])
            self.mask_pt = None
        else:
            w_scale = float(qs[-1])
            mask_scale = float(qs[-2])
            res = encoder.encode(mask, scale=mask_scale, n_q=n_q)
            mont = _to_mont_host(res, qs)
            tbd = ctx.device()["ntt"]
            self.mask_pt = Plaintext(
                data=ntt(jnp.asarray(mont), tbd, limb_slice=(0, n_q)),
                scale=mask_scale)
        self.w_scale = w_scale
        res = np.empty((n_q,) + W.shape, dtype=np.uint32)
        wv = np.round(np.asarray(W, np.float64) * w_scale)
        assert np.abs(wv).max() < 2 ** 62
        wi = wv.astype(np.int64)
        for li, q in enumerate(qs):
            res[li] = (wi % q).astype(np.uint32)
        self.w_digits = jnp.asarray(host_weight_digits(res))
        bm, bo = host_bucket_consts(qs)
        self.bucket_mul = jnp.asarray(bm)
        self.bucket_off = jnp.asarray(bo)
        self.bias = bias
        self._bias_pt = None
        self._bias_key = None
        self.encoder = encoder
        self.bias_mask = mask

    def params(self) -> dict:
        """The large tensors as a pytree, for passing through jit as
        ARGUMENTS instead of baked HLO constants (keeps weight digits and
        mask plaintexts on the data plane — required for remote-compile
        endpoints with bounded request bodies, and shrinks cache keys)."""
        p = {"w": self.w_digits}
        if self.mask_pt is not None:
            p["mask"] = self.mask_pt.data
        return p

    def __call__(self, x: Ciphertext, rescale: bool = True,
                 params: dict | None = None) -> Ciphertext:
        """x: Ciphertext with leading batch axis J.  Output batch axis I.
        ``params``: optional pytree from :meth:`params` (traced args)."""
        ev = self.ev
        assert x.n_q == self.n_q, (x.n_q, self.n_q)
        dv = ev.dev
        w_digits = self.w_digits if params is None else params["w"]
        # [J, P, L, N] -> [I, P, L, N]
        out = mod_matmul(x.data, w_digits, self.bucket_mul,
                         self.bucket_off, dv["q"][:self.n_q],
                         dv["qneg_inv"][:self.n_q])
        ct = Ciphertext(out, x.scale * self.w_scale, True)
        if self.mask_pt is not None:
            mask_pt = self.mask_pt if params is None else \
                Plaintext(params["mask"], self.mask_pt.scale)
            ct = ev.multiply_plain(ct, mask_pt)
        if rescale:
            ct = ev.rescale(ev.rescale(ct))
            if self.bias is not None:
                ct = ev.add_plain(ct, self._bias(ct))
        return ct

    def _bias(self, ct: Ciphertext) -> Plaintext:
        key = (ct.n_q, round(ct.scale))
        if self._bias_key != key:
            slots = self.ev.ctx.cfg.slots
            vecs = np.broadcast_to(np.asarray(self.bias)[:, None],
                                   (self.out_dim, slots)).copy()
            if self.bias_mask is not None:
                vecs *= self.bias_mask[None, :]
            res = self.encoder.encode(vecs, scale=ct.scale, n_q=ct.n_q)
            mont = _to_mont_host(res, self.ev.ctx.q_primes[:ct.n_q])
            tbd = self.ev.ctx.device()["ntt"]
            self._bias_pt = Plaintext(
                data=ntt(jnp.asarray(mont), tbd, limb_slice=(0, ct.n_q)),
                scale=ct.scale)
            self._bias_key = key
        return self._bias_pt


def ccmm_col_to_diag(ev: Evaluator, x: Ciphertext, w: Ciphertext,
                     num_x: int, num_row: int,
                     col_chunk: int | None = None) -> Ciphertext:
    """Col-packed X [C cts] x col-packed W [C cts] -> diagonal-packed X W^T
    [num_row cts]: out[i] = sum_j X_j * rot(W_j, i*num_x)
    (reference: ct_ct_matrix_mul_colpacking, Ct_ct_matrix_mul.hpp:5-55).

    TPU-native DOUBLE-BSGS (the reference pays a full key-switch per
    (diagonal, column); hoisting alone still pays num_row MACs per column).
    With i = s + g*bi and rot a ring automorphism:

        out[s+g*bi] = rot( sum_j rot(X_j, -g*bi*num_x) * rot(W_j, s*num_x),
                           g*bi*num_x )

    so the whole matmul needs ONE hoisted sweep of g-1 baby rotations of W,
    ONE hoisted sweep of b-1 giant rotations of X (both over the C-column
    batch), the cheap dyadic products, one batched relinearization of all
    diagonals, and b-1 giant output rotations of g-diagonal groups:
    ~2*sqrt(num_row) batched key-switch MACs total instead of num_row.

    ``col_chunk``: process the column axis in chunks of this size (bounds
    the [g+b, C, 2, L, N] rotated-operand residency — needed at d=768-scale
    on a 16 GB chip); product partial sums accumulate across chunks.
    """
    assert x.n_q == w.n_q, \
        f"ccmm_col_to_diag level mismatch: X at n_q={x.n_q}, W at n_q={w.n_q}"
    C = x.data.shape[0]
    if col_chunk is None:
        col_chunk = C
    acc = None                      # [b, g, 3, L, N] group partial products
    for lo in range(0, C, col_chunk):
        hi = min(lo + col_chunk, C)
        part = ccmm_col_to_diag_partial(
            ev, x.with_data(x.data[lo:hi]), w.with_data(w.data[lo:hi]),
            num_x, num_row)
        q = ev.dev["q"][:x.n_q].reshape(-1, 1)
        acc = part if acc is None else ma.add_mod(acc, part, q)
        if col_chunk < C:
            acc, xdat, wdat = ma.seq(acc, x.data, w.data)
            x, w = x.with_data(xdat), w.with_data(wdat)
    return ccmm_col_to_diag_finish(ev, acc, x.scale * w.scale, num_x,
                                   num_row)


def ccmm_col_to_diag_partial(ev: Evaluator, x: Ciphertext, w: Ciphertext,
                             num_x: int, num_row: int) -> jnp.ndarray:
    """One column-chunk's double-BSGS partial products: [b, g, 3, L, N]
    (3-poly, pre-relinearization).  Chunks ADD: callers accumulate with
    add_mod and finish with ccmm_col_to_diag_finish — drivers jit each
    chunk separately to keep compile units small."""
    m = num_row
    g, b = _bsgs_split(m)
    q = ev.dev["q"][:x.n_q].reshape(-1, 1)
    qneg = ev.dev["qneg_inv"][:x.n_q].reshape(-1, 1)
    rot_chunk = 4
    wb_rot = ev.rotate_hoisted(w, [s * num_x for s in range(1, g)],
                               chunk=rot_chunk) if g > 1 else None
    wb = jnp.concatenate([w.data[None], wb_rot.data]) \
        if wb_rot is not None else w.data[None]        # [g, c, 2, L, N]
    xg_rot = ev.rotate_hoisted(x, [-gi * g * num_x
                                   for gi in range(1, b)],
                               chunk=rot_chunk) if b > 1 else None
    xg = jnp.concatenate([x.data[None], xg_rot.data]) \
        if xg_rot is not None else x.data[None]        # [b, c, 2, L, N]
    # per giant group: [g, c, 3, L, N] transient, summed over c — the
    # full [b, g, c, 3, L, N] product would be ~25 GB at d=768 scale
    parts = []
    w0 = wb[..., 0, :, :]                              # [g, c, L, N]
    w1 = wb[..., 1, :, :]
    for bi in range(b):
        x0 = xg[bi, None, :, 0, :, :]                  # [1, c, L, N]
        x1 = xg[bi, None, :, 1, :, :]
        c0 = ma.mont_mul(x0, w0, q, qneg)
        c1 = ma.add_mod(ma.mont_mul(x0, w1, q, qneg),
                        ma.mont_mul(x1, w0, q, qneg), q)
        c2 = ma.mont_mul(x1, w1, q, qneg)
        prod = jnp.stack([c0, c1, c2], axis=-3)        # [g, c, 3, L, N]
        p_sum = _sum_axis(prod, 1, q)                  # [g, 3, L, N]
        # sequence the giant groups (ma.seq doc): concurrent [g, c,
        # 3, L, N] products across all b groups would be ~25 GB
        p_sum, wb, xg = ma.seq(p_sum, wb, xg)
        parts.append(p_sum)
    return jnp.stack(parts)                            # [b, g, 3, L, N]


def ccmm_col_to_diag_finish(ev: Evaluator, acc, prod_scale: float,
                            num_x: int, num_row: int) -> Ciphertext:
    """Relinearize the accumulated [b, g, 3, L, N] groups, apply the giant
    output rotations, interleave diagonals, rescale."""
    m = num_row
    g, b = _bsgs_split(m)
    rel = ev.relinearize(Ciphertext(acc, prod_scale, True))
    diags = [None] * m
    rel_d = rel.data
    for bi in range(b):
        ng = min(g, m - bi * g)
        grp = Ciphertext(rel_d[bi, :ng], rel.scale, True)
        if bi:
            grp = ev.rotate(grp, g * bi * num_x)           # giant output rot
            # sequence the giant rotations (ma.seq doc): all b-1 key
            # switches would otherwise schedule concurrently
            gd, rel_d = ma.seq(grp.data, rel_d)
            grp = grp.with_data(gd)
        for s in range(ng):
            diags[bi * g + s] = grp.data[s]
    out = Ciphertext(jnp.stack(diags), rel.scale, True)
    return ev.rescale(ev.rescale(out))


def _sum_axis(data, axis, q):
    """Tree-reduce modular sum along ``axis``."""
    n = data.shape[axis]
    while n > 1:
        half = n // 2
        a = jnp.take(data, jnp.arange(half), axis=axis)
        b = jnp.take(data, jnp.arange(half, 2 * half), axis=axis)
        ext = ma.add_mod(a, b, q)
        if n % 2:
            tail = jnp.take(data, jnp.arange(2 * half, n), axis=axis)
            data = jnp.concatenate([ext, tail], axis=axis)
            n = half + 1
        else:
            data = ext
            n = half
    return jnp.squeeze(data, axis=axis)


def ccmm_diag_to_col(ev: Evaluator, x: Ciphertext, v: Ciphertext,
                     num_x: int, num_row: int,
                     rot_chunk: int = 4) -> Ciphertext:
    """Diagonal-packed A [num_row cts, diag d slot k = A[k, k+d]] x
    col-packed V [dv cts] -> col-packed A V [dv cts], baby-step/giant-step
    (reference: ct_ct_matrix_mul_diagpacking, Ct_ct_matrix_mul.hpp:57-155).

        AV_col_c = sum_d diag_d (*) rot(V_c, d*num_x)
                 = sum_b rot( sum_s rot(diag_{g b+s}, -g b num_x)
                              (*) rot(V_c, s num_x),  g b num_x )

    All rotations are batched: b pre-rotations of diagonal groups, g-1 baby
    rotations of the whole V batch, b-1 giant rotations of partial sums.
    """
    m = num_row
    assert x.data.shape[0] == m
    assert x.n_q == v.n_q, \
        f"ccmm_diag_to_col level mismatch: A at n_q={x.n_q}, V at n_q={v.n_q}"
    g = int(np.ceil(np.sqrt(m)))
    b = int(np.ceil(m / g))
    q = ev.dev["q"][:x.n_q].reshape(-1, 1)
    qneg = ev.dev["qneg_inv"][:x.n_q].reshape(-1, 1)
    # baby-rotated V batch: vb[s] = rot(V, s*num_x) — one hoisted sweep,
    # chunked: an unchunked sweep materializes all g-1 rotations' MAC
    # temporaries at once ([g-1, dv, n_t, N] x several — the AV stage at
    # d=768 scale compiled to a 16.6 GB schedule on the 15.75 GB chip)
    vb_rot = ev.rotate_hoisted(v, [s * num_x for s in range(1, g)],
                               chunk=rot_chunk) \
        if g > 1 else None
    vb = jnp.concatenate([v.data[None], vb_rot.data]) if vb_rot is not None \
        else v.data[None]                                   # [g, dv, 2, L, N]
    total = None
    xdat = x.data
    prod_scale = x.scale * v.scale
    for bi in range(b):
        lo, hi = bi * g, min((bi + 1) * g, m)
        grp = x.with_data(xdat[lo:hi])
        if bi:
            grp = ev.rotate(grp, -g * bi * num_x)           # pre-rotate group
        ng = hi - lo
        a0 = grp.data[:, None, 0, :, :]                     # [ng, 1, L, N]
        a1 = grp.data[:, None, 1, :, :]
        b0 = vb[:ng, :, 0, :, :]                            # [ng, dv, L, N]
        b1 = vb[:ng, :, 1, :, :]
        c0 = ma.mont_mul(a0, b0, q, qneg)
        c1 = ma.add_mod(ma.mont_mul(a0, b1, q, qneg),
                        ma.mont_mul(a1, b0, q, qneg), q)
        c2 = ma.mont_mul(a1, b1, q, qneg)
        prod = jnp.stack([c0, c1, c2], axis=-3)             # [ng, dv, 3, L, N]
        p_sum = _sum_axis(prod, 0, q)                       # [dv, 3, L, N]
        # relinearize + giant-rotate PER GROUP: the r4 all-groups-batched
        # relinearization materialized a [b, dv, D, n_t, N] key-switch
        # decomposition (~6.4 GB at flagship AV dims — OOM under the
        # vmapped-heads driver); per-group it is b x smaller with
        # identical math and work
        part = ev.relinearize(Ciphertext(p_sum, prod_scale, True))
        if bi:
            part = ev.rotate(part, g * bi * num_x)          # giant step
        total = part if total is None else \
            part.with_data(ma.add_mod(total.data, part.data, q))
        # sequence the giant groups (ma.seq doc) — all b groups'
        # products/key-switches would otherwise schedule concurrently
        td, vb, xdat = ma.seq(total.data, vb, xdat)
        total = total.with_data(td)
    return ev.rescale(ev.rescale(total))
