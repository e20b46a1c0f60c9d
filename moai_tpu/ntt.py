"""Negacyclic NTT/INTT over RNS limbs — TPU-native 4-step formulation.

Replaces SEAL's Harvey lazy-butterfly NTT (reference:
thirdparty/SEAL-4.1-bs/native/src/seal/util/ntt.h:195-266 and
util/dwthandler.h:94-262).  Instead of translating the in-place
pointer-strided butterflies, the transform is laid out for the TPU VPU:

  negacyclic NTT(x)[k] = sum_j x_j * psi^((2k+1)j)
    = CyclicNTT_omega(x * psi^j)[k],   omega = psi^2

and the cyclic N-point NTT is computed 4-step style with N = n1*n2
(e.g. 65536 = 256*256):

  1. reshape to [n1, n2]  (j = j1*n2 + j2)
  2. n1-point NTT along axis -2  -> lanes = n2 stay fully utilised
  3. elementwise mid twiddle omega^(k1*j2)
  4. transpose, n2-point NTT along axis -2
  5. flatten: output index k = k2*n1 + k1 is in *natural order*

Natural order gives the clean evaluation-point map  index k <-> exponent
2k+1 (mod 2N), which makes Galois rotations a precomputed gather
(see galois.py).  Every radix-2 stage is a full-width vector op: reshape
[..., n, m] -> [..., B, 2, h, m], one add, one sub, one twiddle mul.

Data stays in Montgomery form (mod_arith.py); twiddles are applied as
plain-residue + Shoup-companion pairs (mod_arith.shoup_mul, ~6 VPU
multiplies vs Montgomery's ~9 — SEAL's Harvey butterflies use the same
operand form, util/ntt.h), which preserves the data's Montgomery factor.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import mod_arith as ma
from .primes import primitive_root_2n, inv_mod


def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _split(n: int) -> tuple[int, int]:
    logn = n.bit_length() - 1
    l1 = logn // 2
    return 1 << l1, 1 << (logn - l1)


def _pow_mod_vec(base: int, exps: np.ndarray, q: int) -> np.ndarray:
    """Vectorized base**exps mod q (q < 2**30, exact in uint64)."""
    result = np.ones(exps.shape, dtype=np.uint64)
    b = np.uint64(base % q)
    e = exps.astype(np.uint64)
    qq = np.uint64(q)
    nbits = int(exps.max()).bit_length() if exps.size else 0
    for _ in range(nbits):
        odd = (e & np.uint64(1)).astype(bool)
        result[odd] = result[odd] * b % qq
        b = b * b % qq
        e = e >> np.uint64(1)
    return result


def _to_mont_vec(x: np.ndarray, q: int) -> np.ndarray:
    """Montgomery form of true residues (vectorized, exact)."""
    r1 = (1 << 32) % q
    return (x.astype(np.uint64) * np.uint64(r1) % np.uint64(q)).astype(np.uint32)


def _shoup_vec(w: np.ndarray, q: int) -> np.ndarray:
    """Shoup companions floor(w*2^32/q) of true residues w < q < 2^30
    (exact: w << 32 fits uint64)."""
    return ((w.astype(np.uint64) << 32) // np.uint64(q)).astype(np.uint32)


class NttTables:
    """Per-context twiddle tables for a list of primes (host numpy arrays).

    ``device()`` returns a pytree of jnp arrays used by the jitted
    transforms.  Limb axis ordering matches the context's prime list.
    """

    def __init__(self, logN: int, qs: list[int]):
        self.logN = logN
        self.N = N = 1 << logN
        self.qs = list(qs)
        n1, n2 = _split(N)
        self.n1, self.n2 = n1, n2
        L = len(qs)

        consts = [ma.mont_constants(q) for q in qs]
        self.q = np.array(qs, dtype=np.uint32)
        self.qneg_inv = np.array([c["qneg_inv"] for c in consts], dtype=np.uint32)
        self.r2 = np.array([c["r2"] for c in consts], dtype=np.uint32)
        self.r1 = np.array([c["r1"] for c in consts], dtype=np.uint32)
        self.psi = [primitive_root_2n(q, 2 * N) for q in qs]

        jj = np.arange(N, dtype=np.int64)
        self.psi_mont = np.zeros((L, N), dtype=np.uint32)
        self.psiinv_n_mont = np.zeros((L, N), dtype=np.uint32)
        self.w_mid = np.zeros((L, n1, n2), dtype=np.uint32)
        self.w_mid_inv = np.zeros((L, n1, n2), dtype=np.uint32)
        # plain-residue twiddles + Shoup companions: the jnp transforms
        # apply precomputed twiddles with mod_arith.shoup_mul (~6 VPU
        # multiplies vs Montgomery's ~9); a plain multiplier preserves
        # the Montgomery form of the data
        self.psi_pl = np.zeros((L, N), dtype=np.uint32)
        self.psi_sh = np.zeros((L, N), dtype=np.uint32)
        self.psiinv_n_pl = np.zeros((L, N), dtype=np.uint32)
        self.psiinv_n_sh = np.zeros((L, N), dtype=np.uint32)
        self.w_mid_pl = np.zeros((L, n1, n2), dtype=np.uint32)
        self.w_mid_sh = np.zeros((L, n1, n2), dtype=np.uint32)
        self.w_mid_inv_pl = np.zeros((L, n1, n2), dtype=np.uint32)
        self.w_mid_inv_sh = np.zeros((L, n1, n2), dtype=np.uint32)
        mid_exp = (np.arange(n1, dtype=np.int64)[:, None]
                   * np.arange(n2, dtype=np.int64)[None, :]) % N
        for i, q in enumerate(qs):
            psi = self.psi[i]
            psii = inv_mod(psi, q)
            ninv = inv_mod(N, q)
            psi_t = _pow_mod_vec(psi, jj, q)
            self.psi_mont[i] = _to_mont_vec(psi_t, q)
            self.psi_pl[i] = psi_t.astype(np.uint32)
            self.psi_sh[i] = _shoup_vec(psi_t, q)
            pij = _pow_mod_vec(psii, jj, q) * np.uint64(ninv) % np.uint64(q)
            self.psiinv_n_mont[i] = _to_mont_vec(pij, q)
            self.psiinv_n_pl[i] = pij.astype(np.uint32)
            self.psiinv_n_sh[i] = _shoup_vec(pij, q)
            omega = psi * psi % q
            mid_t = _pow_mod_vec(omega, mid_exp, q)
            midi_t = _pow_mod_vec(inv_mod(omega, q), mid_exp, q)
            self.w_mid[i] = _to_mont_vec(mid_t, q)
            self.w_mid_inv[i] = _to_mont_vec(midi_t, q)
            self.w_mid_pl[i] = mid_t.astype(np.uint32)
            self.w_mid_sh[i] = _shoup_vec(mid_t, q)
            self.w_mid_inv_pl[i] = midi_t.astype(np.uint32)
            self.w_mid_inv_sh[i] = _shoup_vec(midi_t, q)

        # stage twiddles for the axis NTT sizes (DIF order).
        # n-point cyclic NTT, root w_n = omega^(N/n); DIF stage with block
        # size t uses twiddles w_n^((n/t) j), j < t/2.
        self.stage_tw = {}
        self.stage_tw_inv = {}
        for n in sorted({n1, n2}):
            fwd_stages, inv_stages = [], []
            t = n
            while t > 1:
                half = t // 2
                fw = np.zeros((L, 2, half), dtype=np.uint32)   # [plain, shoup]
                iw = np.zeros((L, 2, half), dtype=np.uint32)
                ex = np.arange(half, dtype=np.int64) * (n // t)
                for i, q in enumerate(qs):
                    omega = self.psi[i] * self.psi[i] % q
                    wn = pow(omega, N // n, q)
                    f_t = _pow_mod_vec(wn, ex, q)
                    i_t = _pow_mod_vec(inv_mod(wn, q), ex, q)
                    fw[i, 0] = f_t.astype(np.uint32)
                    fw[i, 1] = _shoup_vec(f_t, q)
                    iw[i, 0] = i_t.astype(np.uint32)
                    iw[i, 1] = _shoup_vec(i_t, q)
                fwd_stages.append(fw)
                inv_stages.append(iw)
                t = half
            self.stage_tw[n] = fwd_stages
            self.stage_tw_inv[n] = list(reversed(inv_stages))
        self.bitrev = {n: _bitrev_perm(n) for n in {n1, n2}}

    def device(self) -> dict:
        return {
            "q": jnp.asarray(self.q),
            "qneg_inv": jnp.asarray(self.qneg_inv),
            "r2": jnp.asarray(self.r2),
            "r1": jnp.asarray(self.r1),
            "psi_pl": jnp.asarray(self.psi_pl),
            "psi_sh": jnp.asarray(self.psi_sh),
            "psiinv_n_pl": jnp.asarray(self.psiinv_n_pl),
            "psiinv_n_sh": jnp.asarray(self.psiinv_n_sh),
            "w_mid_pl": jnp.asarray(self.w_mid_pl),
            "w_mid_sh": jnp.asarray(self.w_mid_sh),
            "w_mid_inv_pl": jnp.asarray(self.w_mid_inv_pl),
            "w_mid_inv_sh": jnp.asarray(self.w_mid_inv_sh),
            "stage_tw": {n: [jnp.asarray(a) for a in v]
                         for n, v in self.stage_tw.items()},
            "stage_tw_inv": {n: [jnp.asarray(a) for a in v]
                             for n, v in self.stage_tw_inv.items()},
            "bitrev": {n: jnp.asarray(v) for n, v in self.bitrev.items()},
        }


# ---------------------------------------------------------------------------
# jnp transforms.  Data shape: [..., L, N]; limb axis is -2.
# ---------------------------------------------------------------------------

def _axis_ntt_dif(x, stages, bitrev, q, qneg):
    """n-point cyclic NTT along axis -2 of [..., L, n, m]; natural->natural.

    q/qneg: per-limb constants of shape [L] (reshaped internally).
    Twiddles are applied as plain+Shoup pairs (mod_arith.shoup_mul).
    """
    n, m = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    q4 = q.reshape(-1, 1, 1, 1)
    t = n
    for tw in stages:                      # tw: [L, 2, t/2] (plain, shoup)
        half = t // 2
        blocks = n // t
        xv = x.reshape(lead + (blocks, 2, half, m))
        u = xv[..., 0, :, :]               # [..., L, blocks, half, m]
        v = xv[..., 1, :, :]
        twp = tw[:, 0].reshape(-1, 1, half, 1)   # [L,1,half,1]
        tws = tw[:, 1].reshape(-1, 1, half, 1)
        s = ma.add_mod(u, v, q4)
        d = ma.shoup_mul(ma.sub_mod(u, v, q4), twp, tws, q4)
        x = jnp.stack([s, d], axis=-3).reshape(lead + (n, m))
        t = half
    return jnp.take(x, bitrev, axis=-2)


def _axis_intt_dit(x, stages_inv, bitrev, q, qneg):
    """Inverse of _axis_ntt_dif (without the 1/n factor)."""
    n, m = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    q4 = q.reshape(-1, 1, 1, 1)
    x = jnp.take(x, bitrev, axis=-2)       # to DIF output order
    t = 1
    for tw in stages_inv:                  # reversed stage order, w^{-1}
        half = t
        t *= 2
        blocks = n // t
        xv = x.reshape(lead + (blocks, 2, half, m))
        a = xv[..., 0, :, :]
        b = xv[..., 1, :, :]
        twp = tw[:, 0].reshape(-1, 1, half, 1)
        tws = tw[:, 1].reshape(-1, 1, half, 1)
        bw = ma.shoup_mul(b, twp, tws, q4)
        u = ma.add_mod(a, bw, q4)
        v = ma.sub_mod(a, bw, q4)
        x = jnp.stack([u, v], axis=-3).reshape(lead + (n, m))
    return x


def _sl(a, limb_slice):
    return a if limb_slice is None else a[limb_slice[0]:limb_slice[1]]


def ntt(x, tb, limb_slice=None):
    """Forward negacyclic NTT.  x: [..., L, N] Montgomery uint32.

    tb: device table dict from NttTables.device().  limb_slice: optional
    static (start, stop) selecting the active limbs inside the tables.
    Output index k holds the evaluation at root exponent (2k+1).

    Dispatches to the Pallas MXU kernel (pallas_ntt.py) when the context
    attached its tables (TPU backend, N large enough for tiling).
    """
    if "pallas" in tb and x.shape[-1] >= (1 << 14):
        from .pallas_ntt import ntt_pallas
        return ntt_pallas(x, tb["pallas"], limb_slice)
    N = x.shape[-1]
    n1 = tb["w_mid_pl"].shape[-2]
    n2 = tb["w_mid_pl"].shape[-1]
    q = _sl(tb["q"], limb_slice).reshape(-1, 1)
    qneg = _sl(tb["qneg_inv"], limb_slice).reshape(-1, 1)
    assert q.shape[0] == x.shape[-2], (q.shape, x.shape)

    x = ma.shoup_mul(x, _sl(tb["psi_pl"], limb_slice),
                     _sl(tb["psi_sh"], limb_slice), q)
    x = x.reshape(x.shape[:-1] + (n1, n2))
    q2, qneg2 = q.reshape(-1, 1), qneg.reshape(-1, 1)
    x = _axis_ntt_dif(x, [_sl(a, limb_slice) for a in tb["stage_tw"][n1]],
                      tb["bitrev"][n1], q2, qneg2)
    x = ma.shoup_mul(x, _sl(tb["w_mid_pl"], limb_slice),
                     _sl(tb["w_mid_sh"], limb_slice), q.reshape(-1, 1, 1))
    x = jnp.swapaxes(x, -1, -2)
    x = _axis_ntt_dif(x, [_sl(a, limb_slice) for a in tb["stage_tw"][n2]],
                      tb["bitrev"][n2], q2, qneg2)
    return x.reshape(x.shape[:-2] + (N,))


def intt(x, tb, limb_slice=None):
    """Inverse negacyclic NTT (exact inverse of ``ntt``)."""
    if "pallas" in tb and x.shape[-1] >= (1 << 14):
        from .pallas_ntt import intt_pallas
        return intt_pallas(x, tb["pallas"], limb_slice)
    N = x.shape[-1]
    n1 = tb["w_mid_pl"].shape[-2]
    n2 = tb["w_mid_pl"].shape[-1]
    q = _sl(tb["q"], limb_slice).reshape(-1, 1)
    qneg = _sl(tb["qneg_inv"], limb_slice).reshape(-1, 1)
    q2, qneg2 = q.reshape(-1, 1), qneg.reshape(-1, 1)

    x = x.reshape(x.shape[:-1] + (n2, n1))
    x = _axis_intt_dit(x, [_sl(a, limb_slice) for a in tb["stage_tw_inv"][n2]],
                       tb["bitrev"][n2], q2, qneg2)
    x = jnp.swapaxes(x, -1, -2)
    x = ma.shoup_mul(x, _sl(tb["w_mid_inv_pl"], limb_slice),
                     _sl(tb["w_mid_inv_sh"], limb_slice),
                     q.reshape(-1, 1, 1))
    x = _axis_intt_dit(x, [_sl(a, limb_slice) for a in tb["stage_tw_inv"][n1]],
                       tb["bitrev"][n1], q2, qneg2)
    x = x.reshape(x.shape[:-2] + (N,))
    return ma.shoup_mul(x, _sl(tb["psiinv_n_pl"], limb_slice),
                        _sl(tb["psiinv_n_sh"], limb_slice), q)
