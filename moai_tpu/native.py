"""ctypes bindings to the native host library (native/moai_host.cpp).

The native library replaces the host-side parts of the reference's C++
stack (reference: SEAL's exact big-int encode rounding, ckks.h:457-560,
and the util/ntt.* oracle).  The device compute path stays JAX; this is
the client/host side: exact encode for coefficients past the numpy
int64 fast path, exact centered decode, and an independent negacyclic
NTT oracle for cross-checking the JAX 4-step NTT in tests.

The .so is built on demand with make (g++ is part of the toolchain);
callers use ``available()`` to gate, and every entry point has a numpy
fallback path in its caller.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO = os.path.join(_DIR, "libmoai_host.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def _get():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.encode_residues.argtypes = [f64p, ctypes.c_int64, u64p,
                                    ctypes.c_int64, u32p]
    lib.decode_centered.argtypes = [u32p, ctypes.c_int64, u64p,
                                    ctypes.c_int64, f64p]
    lib.ntt_negacyclic.argtypes = [u64p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_uint64, ctypes.c_uint64]
    lib.intt_negacyclic.argtypes = [u64p, ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_uint64, ctypes.c_uint64]
    _lib = lib
    return _lib


def available() -> bool:
    return _get() is not None


def encode_residues(coeffs: np.ndarray, primes) -> np.ndarray:
    """float64 coefficients [..., N] -> uint32 residues [..., n_q, N],
    exact for any magnitude (doubles are exact integers)."""
    lib = _get()
    assert lib is not None
    c = np.ascontiguousarray(coeffs, np.float64)
    flat = c.reshape(-1)
    qs = np.ascontiguousarray(primes, np.uint64)
    out = np.empty((len(qs), flat.size), np.uint32)
    lib.encode_residues(flat, flat.size, qs, len(qs), out)
    return np.moveaxis(out.reshape((len(qs),) + c.shape), 0, -2)


def decode_centered(residues: np.ndarray, primes) -> np.ndarray:
    """uint32 residues [..., n_q, N] -> centered float64 values [..., N]."""
    lib = _get()
    assert lib is not None
    r = np.ascontiguousarray(residues, np.uint32)
    qs = np.ascontiguousarray(primes, np.uint64)
    n_q = r.shape[-2]
    assert n_q == len(qs)
    lead = r.shape[:-2]
    n = r.shape[-1]
    r2 = r.reshape(-1, n_q, n)
    out = np.empty((r2.shape[0], n), np.float64)
    for b in range(r2.shape[0]):
        lib.decode_centered(np.ascontiguousarray(r2[b]), n, qs, n_q, out[b])
    return out.reshape(lead + (n,))


def ntt_oracle(data: np.ndarray, q: int, psi: int, inverse: bool = False
               ) -> np.ndarray:
    """Independent negacyclic NTT (bit-reversed output order) over prime q
    with primitive 2N-th root psi; data [..., N] uint64 standard rep."""
    lib = _get()
    assert lib is not None
    d = np.ascontiguousarray(data, np.uint64)
    flat = d.reshape(-1, d.shape[-1]).copy()
    fn = lib.intt_negacyclic if inverse else lib.ntt_negacyclic
    fn(flat, flat.shape[0], flat.shape[1], q, psi)
    return flat.reshape(d.shape)
