"""CKKS encoder — canonical embedding via host FFT + exact RNS residues.

TPU-native counterpart of SEAL's CKKSEncoder (reference:
thirdparty/SEAL-4.1-bs/native/src/seal/ckks.h:457-560 encode,
:700-800 decode).  Design differences:

- Encode/decode are *client-side* operations: they run on host in numpy
  float64 (like SEAL's double FFT) and exchange only uint32 RNS arrays
  with the device.  No secret-dependent data ever crosses into jitted code.
- Instead of SEAL's hand-rolled special FFT (util/dwthandler.h shared with
  the NTT), the canonical embedding is evaluated through a single length-N
  complex FFT plus a gather:  m(zeta^(2t+1)) for all odd exponents equals
  ifft(m_k * zeta^k) * N, and slot j lives at exponent 5^j (its conjugate
  partner at -5^j).  This matches the NTT-domain index map (ntt.py:
  index k <-> exponent 2k+1), so Galois rotations are plain gathers.
- CRT decode avoids big-int loops entirely: with |centered value| < 2^62,
  the composition  m = sum_i lam_i * Qhat_i - k*Q  is computed mod 2^64 in
  wrapping uint64 numpy, with the integer k recovered from a float64
  estimate of sum_i lam_i / q_i.
"""

from __future__ import annotations

import numpy as np

from .params import Context


class Encoder:
    def __init__(self, ctx: Context):
        self.ctx = ctx
        N = ctx.cfg.N
        self.N = N
        self.slots = N // 2
        two_n = 2 * N
        # slot j <-> exponent 5^j mod 2N; NTT/eval index t <-> exponent 2t+1
        rot = np.empty(self.slots, dtype=np.int64)
        g = 1
        for j in range(self.slots):
            rot[j] = g
            g = g * 5 % two_n
        self.rot_group = rot
        self.slot_to_t = (rot - 1) // 2                        # exponent 5^j
        self.conj_slot_to_t = (two_n - rot - 1) // 2           # exponent -5^j
        k = np.arange(N)
        self.zeta_pow = np.exp(1j * np.pi * k / N)             # zeta^k
        self.zeta_pow_inv = np.exp(-1j * np.pi * k / N)

    # -- embedding --------------------------------------------------------
    def embed_to_slots(self, coeffs: np.ndarray) -> np.ndarray:
        """Real (or float) coefficient vector(s) [..., N] -> slots [..., N/2]."""
        twisted = coeffs.astype(np.complex128) * self.zeta_pow
        evals = np.fft.ifft(twisted, axis=-1) * self.N         # at exp 2t+1
        return evals[..., self.slot_to_t]

    def slots_to_coeffs(self, vals: np.ndarray) -> np.ndarray:
        """Slot values [..., N/2] -> real coefficient vector [..., N]."""
        vals = np.asarray(vals, dtype=np.complex128)
        full = np.zeros(vals.shape[:-1] + (self.N,), dtype=np.complex128)
        full[..., self.slot_to_t] = vals
        full[..., self.conj_slot_to_t] = np.conj(vals)
        twisted = np.fft.fft(full, axis=-1) / self.N
        return np.real(twisted * self.zeta_pow_inv)

    # -- RNS encode/decode ------------------------------------------------
    def encode(self, vals, scale: float | None = None, n_q: int | None = None
               ) -> np.ndarray:
        """Encode slot values -> uint32 RNS residue array [..., n_q, N]
        (standard representation; callers convert to Montgomery on device
        or via ``to_mont_host``).

        vals: scalar, [slots] or [..., slots] real/complex array; shorter
        vectors are zero-padded (SEAL repeats-or-errors; padding suits the
        matmul packing here).
        """
        ctx = self.ctx
        scale = float(scale if scale is not None else ctx.scale)
        n_q = n_q if n_q is not None else ctx.L
        vals = np.asarray(vals)
        if vals.ndim == 0:
            vals = np.full(self.slots, complex(vals))
        if vals.shape[-1] < self.slots:
            pad = np.zeros(vals.shape[:-1] + (self.slots - vals.shape[-1],),
                           dtype=np.complex128)
            vals = np.concatenate([vals.astype(np.complex128), pad], axis=-1)
        coeffs = self.slots_to_coeffs(vals) * scale
        rounded = np.round(coeffs)
        if np.abs(rounded).max() >= 2 ** 62:
            # exact big-int path (native C++; reference: SEAL's big-int
            # rounding fallback in CKKSEncoder::encode_internal,
            # ckks.h:457-560) — doubles are exact integers at any
            # magnitude, reduced per-prime with 128-bit mulmod.
            from . import native
            if native.available():
                return native.encode_residues(rounded,
                                              ctx.q_primes[:n_q])
            flat = rounded.reshape(-1)
            out = np.empty((n_q, flat.size), dtype=np.uint32)
            for i in range(n_q):
                q = ctx.q_primes[i]
                out[i] = [int(c) % q for c in flat]
            return np.moveaxis(
                out.reshape((n_q,) + rounded.shape), 0, -2)
        c_int = rounded.astype(np.int64)
        out = np.empty(vals.shape[:-1] + (n_q, self.N), dtype=np.uint32)
        for i in range(n_q):
            q = ctx.q_primes[i]
            out[..., i, :] = (c_int % q).astype(np.uint32)
        return out

    def decode(self, residues: np.ndarray, scale: float, n_q: int | None = None
               ) -> np.ndarray:
        """uint32 RNS residues [..., n_q, N] (standard rep) -> complex slots.

        Exact for centered values |m| < 2^62 (wrapping-uint64 CRT).
        """
        ctx = self.ctx
        res = np.asarray(residues, dtype=np.uint64)
        n_q = n_q if n_q is not None else res.shape[-2]
        qs = ctx.q_primes[:n_q]
        Q = 1
        for q in qs:
            Q *= q
        lam = np.empty_like(res[..., :n_q, :])
        fsum = np.zeros(res.shape[:-2] + (self.N,), dtype=np.float64)
        acc64 = np.zeros(res.shape[:-2] + (self.N,), dtype=np.uint64)
        for i, q in enumerate(qs):
            hat = Q // q
            hat_inv = pow(hat % q, -1, q)
            lam_i = res[..., i, :] * np.uint64(hat_inv) % np.uint64(q)
            fsum += lam_i.astype(np.float64) / q
            acc64 += lam_i * np.uint64(hat % (1 << 64))        # wraps mod 2^64
        k = np.round(fsum).astype(np.uint64)
        # |centered value| ~= |frac(fsum)| * Q; past the int64 window the
        # wrapping trick aliases — switch to the exact native CRT
        # (reference: SEAL composes through a full big-int,
        # util/rns.h:79-83)
        frac = np.abs(fsum - np.round(fsum)).max()
        log2Q = sum(np.log2(float(q)) for q in qs)
        if frac > 0 and np.log2(frac) + log2Q > 61:
            from . import native
            if native.available():
                m = native.decode_centered(
                    np.asarray(residues, np.uint32)[..., :n_q, :],
                    qs) / scale
                if not np.isfinite(m).all():
                    raise ValueError(
                        "decode produced non-finite coefficients "
                        "(centered value exceeds float64 range)")
                return self.embed_to_slots(m)
        acc64 -= k * np.uint64(Q % (1 << 64))
        m = acc64.astype(np.int64).astype(np.float64) / scale
        if not np.isfinite(m).all():
            raise ValueError(
                "decode produced non-finite coefficients (centered value "
                "outside the representable window) — decrypt at a lower "
                "level or via native.decode_centered")
        return self.embed_to_slots(m)
