"""CKKS parameter sets, modulus-chain ladder, and precomputed context.

TPU-native counterpart of SEAL's EncryptionParameters/SEALContext
(reference: thirdparty/SEAL-4.1-bs/native/src/seal/encryptionparams.h,
context.h): one host-side object holding the prime ladder, Montgomery/NTT
tables, RNS conversion constants and key-switching digit layout, all
precomputed as numpy arrays and uploaded once as a jnp pytree.

Composite-scale design: TPU limbs are uint32 (primes < 2**30, see
mod_arith.py).  A *data level* is a pair of ~26-bit primes whose product
~ 2**52 acts as one SEAL-style 46..52-bit prime: a "level rescale" performs
two single-prime rescales.  The chain layout mirrors the reference
(test/test_full_scheme.hpp:345-378):

    Q = [q0 primes] + [data pairs] * n_data_levels + [boot pairs] * n_boot
    P = [special primes] * k_sp          (hybrid key-switching modulus)

Security note: like the reference (sec_level_type::none,
test/test_full_scheme.hpp:389) the library does not hard-enforce a security
level; ``estimate_security_bits`` reports the standard logQP-based estimate.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import numpy as np
import jax.numpy as jnp

from . import mod_arith as ma
from .primes import ntt_primes_near, inv_mod
from .ntt import NttTables


@dataclasses.dataclass(frozen=True)
class CKKSConfig:
    """User-facing parameter choice (all sizes in bits unless noted)."""
    logN: int = 14
    # base modulus q0: product of these prime sizes (bits); the plaintext
    # lives mod q0 after all levels are consumed.
    q0_bits: tuple = (30.0, 21.0)
    # data levels: pairs of primes; scale = product of each pair ~ 2**(2*b)
    data_pair_bits: float = 26.0
    n_data_levels: int = 6
    # bootstrapping levels (consumed by the bootstrap pipeline itself)
    boot_pair_bits: float = 29.0
    n_boot_levels: int = 0
    # hybrid key-switching: number of digits; special primes sized to cover
    # the largest digit product.
    dnum: int = 3
    special_bits: float = 29.5
    # sparse ternary secret Hamming weight (reference fork:
    # encryptionparams.h:188, rlwe.cpp:46-58); 0 = uniform ternary
    hamming_weight: int = 192
    noise_std: float = 3.2

    @property
    def N(self) -> int:
        return 1 << self.logN

    @property
    def slots(self) -> int:
        return self.N // 2


def _pair_primes(two_n: int, bits: float, count_pairs: int, exclude) -> list[int]:
    """Pick 2*count_pairs primes around 2**bits, alternating below/above the
    target so each consecutive pair's product stays close to 2**(2*bits)."""
    lo = ntt_primes_near(bits, two_n, count_pairs, exclude=exclude,
                         direction="down")
    hi = ntt_primes_near(bits, two_n, count_pairs,
                         exclude=list(exclude) + lo, direction="up")
    # pair the k-th smallest "lo" with the k-th largest "hi" to balance drift
    lo_sorted = sorted(lo, reverse=True)
    hi_sorted = sorted(hi)
    out = []
    for a, b in zip(lo_sorted, hi_sorted):
        out.extend([a, b])
    return out


class Context:
    """Precomputed CKKS context: ladder, tables, RNS/keyswitch constants."""

    def __init__(self, cfg: CKKSConfig):
        self.cfg = cfg
        N = cfg.N
        two_n = 2 * N

        used: list[int] = []
        q0 = []
        for b in cfg.q0_bits:
            q0 += ntt_primes_near(b, two_n, 1, exclude=used)
            used += q0[-1:]
        data = _pair_primes(two_n, cfg.data_pair_bits, cfg.n_data_levels, used)
        used += data
        boot = _pair_primes(two_n, cfg.boot_pair_bits, cfg.n_boot_levels, used) \
            if cfg.n_boot_levels else []
        used += boot

        self.q_primes: list[int] = q0 + data + boot    # Q, low->high chain
        self.n_q0 = len(q0)
        self.L = len(self.q_primes)

        # hybrid KS digit layout over the full Q basis
        dnum = max(1, min(cfg.dnum, self.L))
        alpha = math.ceil(self.L / dnum)
        self.dnum, self.alpha = dnum, alpha
        self.digit_ranges = [(d * alpha, min((d + 1) * alpha, self.L))
                             for d in range(dnum)]
        # special primes must cover the largest digit product
        max_digit_bits = max(
            sum(math.log2(self.q_primes[i]) for i in range(a, b))
            for a, b in self.digit_ranges)
        k_sp = math.ceil(max_digit_bits / cfg.special_bits)
        self.p_primes = ntt_primes_near(cfg.special_bits, two_n, k_sp,
                                        exclude=used, direction="up")
        self.K = len(self.p_primes)

        self.all_primes = self.q_primes + self.p_primes
        self.sp_slice = (self.L, self.L + self.K)

        # scale bookkeeping
        self.scale = float(np.prod([float(p) for p in
                                    data[:2]])) if data else float(q0[-1])
        self.q0_product = 1
        for p in q0:
            self.q0_product *= p

        # NTT + Montgomery tables over ALL primes (Q then P)
        self.ntt = NttTables(cfg.logN, self.all_primes)

        self._build_rns_tables()
        self._dev = None

    # -- helpers ----------------------------------------------------------
    def prime(self, i: int) -> int:
        return self.all_primes[i]

    def q_product(self, n_q: int) -> int:
        out = 1
        for p in self.q_primes[:n_q]:
            out *= p
        return out

    def estimate_security_bits(self, quantum: bool = False) -> float:
        """Primal-uSVP core-SVP estimate for THIS chain's N, full key
        modulus QP and secret distribution (moai_tpu.security; replaces
        the round-4 folklore logQP rule).  See SECURITY.md for the
        committed chain table and methodology caveats."""
        from .security import context_security_bits
        return context_security_bits(self, quantum=quantum)

    # -- RNS precomputations ---------------------------------------------
    def _build_rns_tables(self):
        primes = self.all_primes
        L, K = self.L, self.K
        nall = L + K

        def mont(x, q):
            return (x % q) * (1 << 32) % q

        # rescale tables: dropping Q prime index ell (the current top prime)
        # new_limb_j = (limb_j - lift(limb_ell)) * qell^{-1} mod q_j
        # SEAL: Evaluator::mod_switch_scale_to_next -> RNSTool::
        # divide_and_round_q_last_inplace (util/rns.h:205).
        # tables indexed [ell][j<ell]  (numpy padded [L, L])
        self.resc_qlinv_mont = np.zeros((L, L), dtype=np.uint32)  # (q_ell^{-1} mod q_j)*R
        self.resc_half = np.zeros(L, dtype=np.uint32)             # q_ell >> 1
        self.resc_half_mod = np.zeros((L, L), dtype=np.uint32)    # ((q_ell>>1) mod q_j)*R
        for ell in range(1, L):
            qe = primes[ell]
            self.resc_half[ell] = qe >> 1
            for j in range(ell):
                qj = primes[j]
                self.resc_qlinv_mont[ell, j] = mont(inv_mod(qe % qj, qj), qj)
                self.resc_half_mod[ell, j] = mont((qe >> 1) % qj, qj)

        # mod-down-by-P tables (keyswitch tail): conv P -> q_j then *P^{-1}
        # hatP_i = P / p_i ;  lambda_i = [x_i * hatP_i^{-1}]_{p_i}
        P = 1
        for p in self.p_primes:
            P *= p
        self.P_int = P
        self.pdown_hatinv_mont = np.zeros(K, dtype=np.uint32)     # (hatP_i^{-1} mod p_i)*R
        self.pdown_hat_modq_mm = np.zeros((K, L), dtype=np.uint32)  # (hatP_i mod q_j)*R^2 -> mont result
        self.pdown_pinv_mont = np.zeros(L, dtype=np.uint32)       # (P^{-1} mod q_j)*R
        self.pdown_half = np.array([p >> 1 for p in self.p_primes], np.uint32)
        self.pdown_half_modq = np.zeros(L, dtype=np.uint32)       # (P>>1) mod q_j true
        for i, p in enumerate(self.p_primes):
            hat = P // p
            self.pdown_hatinv_mont[i] = mont(inv_mod(hat % p, p), p)
            for j, qj in enumerate(self.q_primes):
                # store hat*R^2? mont_mul(lambda_true, hat*R mod q) = lambda*hat (true)
                # we want result directly in Montgomery: store hat*R^2 reduced
                self.pdown_hat_modq_mm[i, j] = (hat % qj) * pow(2, 64, qj) % qj
        for j, qj in enumerate(self.q_primes):
            self.pdown_pinv_mont[j] = mont(inv_mod(P % qj, qj), qj)
            self.pdown_half_modq[j] = (P >> 1) % qj

        # hybrid-KS digit decomposition tables, per level (n_q active primes).
        # For digit d with active primes S = digit_range(d) ∩ [0, n_q):
        #   lambda_i = [x_i * (S/s_i)^{-1}]_{s_i}   (true value)
        #   y_t = sum_i lambda_i * (S/s_i mod t)    for t in active Q + P
        # Tables: hatS_inv [L(levels), dnum, alpha] (Montgomery mult const);
        #         hatS_mod_t [L, dnum, alpha, nall] stored *R^2 so the MAC
        #         lands directly in Montgomery form.
        self.ks_hatinv_mont = np.zeros((L + 1, self.dnum, self.alpha),
                                       dtype=np.uint32)
        self.ks_hat_mm = np.zeros((L + 1, self.dnum, self.alpha, nall),
                                  dtype=np.uint32)
        # per-position prime constants padded to dnum*alpha (positions past
        # L reuse the last prime — their lambdas are identically zero)
        npos = self.dnum * self.alpha
        self.ks_q_pad = np.full(npos, primes[L - 1], dtype=np.uint32)
        self.ks_qneg_pad = np.zeros(npos, dtype=np.uint32)
        for i in range(npos):
            q = primes[i] if i < L else primes[L - 1]
            self.ks_q_pad[i] = q
            self.ks_qneg_pad[i] = ((1 << 32) - pow(q, -1, 1 << 32)) % (1 << 32)
        for n_q in range(1, L + 1):
            for d, (a, b) in enumerate(self.digit_ranges):
                b_act = min(b, n_q)
                if a >= b_act:
                    continue
                S = 1
                for i in range(a, b_act):
                    S *= primes[i]
                for ii, i in enumerate(range(a, b_act)):
                    si = primes[i]
                    hat = S // si
                    self.ks_hatinv_mont[n_q, d, ii] = mont(inv_mod(hat % si, si), si)
                    for t in range(nall):
                        qt = primes[t]
                        self.ks_hat_mm[n_q, d, ii, t] = \
                            (hat % qt) * pow(2, 64, qt) % qt

    # -- device pytree -----------------------------------------------------
    def device(self) -> dict:
        if self._dev is None:
            import os
            import jax
            ntt_dev = self.ntt.device()
            if (jax.default_backend() not in ("cpu",)
                    and self.cfg.N >= (1 << 14)
                    and os.environ.get("MOAI_PALLAS", "1") != "0"):
                from .pallas_ntt import PallasNttTables
                ntt_dev["pallas"] = PallasNttTables(self.ntt).device()
            self._dev = {
                "ntt": ntt_dev,
                "q": jnp.asarray(self.ntt.q),
                "qneg_inv": jnp.asarray(self.ntt.qneg_inv),
                "r2": jnp.asarray(self.ntt.r2),
                "r1": jnp.asarray(self.ntt.r1),
                "resc_qlinv_mont": jnp.asarray(self.resc_qlinv_mont),
                "resc_half": jnp.asarray(self.resc_half),
                "resc_half_mod": jnp.asarray(self.resc_half_mod),
                "pdown_hatinv_mont": jnp.asarray(self.pdown_hatinv_mont),
                "pdown_hat_modq_mm": jnp.asarray(self.pdown_hat_modq_mm),
                "pdown_pinv_mont": jnp.asarray(self.pdown_pinv_mont),
                "pdown_half": jnp.asarray(self.pdown_half),
                "pdown_half_modq": jnp.asarray(self.pdown_half_modq),
                "ks_hatinv_mont": jnp.asarray(self.ks_hatinv_mont),
                "ks_hat_mm": jnp.asarray(self.ks_hat_mm),
                "ks_q_pad": jnp.asarray(self.ks_q_pad),
                "ks_qneg_pad": jnp.asarray(self.ks_qneg_pad),
            }
        return self._dev


@functools.lru_cache(maxsize=8)
def make_context(cfg: CKKSConfig) -> Context:
    return Context(cfg)


# canonical configs ---------------------------------------------------------

def test_config() -> CKKSConfig:
    """Small, fast config for unit tests (pytest on CPU)."""
    return CKKSConfig(logN=11, q0_bits=(29.0, 21.0), data_pair_bits=26.0,
                      n_data_levels=3, n_boot_levels=0, dnum=2,
                      hamming_weight=64)


def bench_config_n15() -> CKKSConfig:
    """BASELINE.json config 1: mult+rescale+rotation at N=2^15.

    q0 = 60 bits > composite scale (2^52) + headroom 2^7, so messages
    |m| < ~64 survive at the bottom level (the reference keeps
    logq0=51 > logp=46 for the same reason, test_full_scheme.hpp:345)."""
    return CKKSConfig(logN=15, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                      n_data_levels=8, n_boot_levels=0, dnum=3,
                      hamming_weight=192)


def _approx_security_bits(cfg: CKKSConfig) -> float:
    """Closed-form estimate from the CONFIG bit budget (no prime search):
    logQP ~ sum of configured sizes + special primes covering the largest
    hybrid digit.  Good to ~1 bit vs the built-context estimate."""
    from .security import security_bits
    logq = (sum(cfg.q0_bits) + 2 * cfg.data_pair_bits * cfg.n_data_levels
            + 2 * cfg.boot_pair_bits * cfg.n_boot_levels)
    n_primes = len(cfg.q0_bits) + 2 * (cfg.n_data_levels + cfg.n_boot_levels)
    alpha = math.ceil(n_primes / max(1, min(cfg.dnum, n_primes)))
    digit_bits = alpha * max(cfg.q0_bits[0], cfg.data_pair_bits,
                             cfg.boot_pair_bits)
    special = math.ceil(digit_bits / cfg.special_bits) * cfg.special_bits
    return security_bits(cfg.N, logq + special,
                         hamming_weight=cfg.hamming_weight or None)


def flagship_config() -> CKKSConfig:
    """Full MOAI-equivalent chain at N=2^16: 20 data levels + 16 boot
    levels (the reference uses 14 boot levels, test_full_scheme.hpp:
    345-378; our pipeline spends 3 CoeffToSlot + 10 EvalMod + 3
    SlotToCoeff composite levels).  q0 = 60 bits (see bench_config_n15
    note).

    Security: ~57 bits conservative core-SVP (SECURITY.md) — the
    throughput-first chain.  The reference's own chain (logQP 1743,
    sec_level_type::none) is ~94 bits in the same model; use
    :func:`flagship_parity_config` for a chain at reference-comparable
    hardness."""
    cfg = CKKSConfig(logN=16, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=20, boot_pair_bits=29.0, n_boot_levels=16,
                     dnum=6, hamming_weight=192)
    bits = _approx_security_bits(cfg)
    assert bits >= 55.0, \
        f"flagship chain regressed below its documented floor: {bits:.1f}"
    return cfg


def flagship_parity_config() -> CKKSConfig:
    """N=2^16 chain sized to the reference's bit budget (logp=46 data
    levels, logq=51 q0/boot levels, test_full_scheme.hpp:357-378):
    23-bit data pairs, 25.5-bit boot pairs, 51-bit q0, dnum=13 so the
    special primes stay small.  ~74 bits conservative core-SVP vs the
    reference chain's ~94 (the remaining gap is our 2 extra boot levels
    + hybrid-KS special primes; SECURITY.md has the full table)."""
    return CKKSConfig(logN=16, q0_bits=(26.0, 25.0), data_pair_bits=23.0,
                      n_data_levels=20, boot_pair_bits=25.5,
                      n_boot_levels=16, dnum=13, special_bits=29.5,
                      hamming_weight=192)
