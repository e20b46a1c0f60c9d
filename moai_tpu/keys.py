"""Key generation: secret/public/relinearization/Galois keys.

TPU-native counterpart of SEAL's KeyGenerator (reference:
thirdparty/SEAL-4.1-bs/native/src/seal/keygenerator.cpp, incl. the fork's
sparse-ternary secret path at keygenerator.cpp:64-76 / rlwe.cpp:46-58).

Differences by design:
- *Hybrid* key-switching keys (dnum digits over the full Q basis, one
  shared special-prime set P) instead of SEAL's per-limb decomposition —
  essential with ~70 small uint32 primes, and fewer/bigger MACs suit the
  TPU VPU.  Digit d's key encrypts  P * gamma_d * target  where
  gamma_d = (Q/D_d) * [(Q/D_d)^{-1} mod D_d]  (== 1 mod primes of D_d,
  == 0 mod other Q primes), which stays valid at every level.
- Sampling runs on host numpy (keygen is offline, client-side); uniform
  key polys are sampled directly in the NTT domain.
- All key material is stored in NTT + Montgomery form, shape
  [dnum, 2, L+K, N], ready for the batched key-switch MAC.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from . import mod_arith as ma
from .params import Context
from .ntt import ntt


def _to_mont_host(res: np.ndarray, primes) -> np.ndarray:
    """Standard residues [..., L, N] -> Montgomery form (host, exact)."""
    out = np.empty_like(res, dtype=np.uint32)
    for i, q in enumerate(primes):
        r1 = (1 << 32) % q
        out[..., i, :] = (res[..., i, :].astype(np.uint64) * np.uint64(r1)
                          % np.uint64(q)).astype(np.uint32)
    return out


def _residues(coeffs: np.ndarray, primes) -> np.ndarray:
    """Signed int coefficients [..., N] -> standard residues [..., L, N]."""
    c = coeffs.astype(np.int64)
    out = np.empty(c.shape[:-1] + (len(primes), c.shape[-1]), dtype=np.uint32)
    for i, q in enumerate(primes):
        out[..., i, :] = (c % q).astype(np.uint32)
    return out


@dataclasses.dataclass
class SecretKey:
    coeffs: np.ndarray        # host ternary coefficients [N] (client-side!)
    s_ntt: jax.Array          # [L+K, N] NTT Montgomery (device, for keygen/tests)


@dataclasses.dataclass
class PublicKey:
    data: jax.Array           # [2, L, N] NTT Montgomery  (b = -(a s) + e, a)


@dataclasses.dataclass
class KSwitchKey:
    data: jax.Array           # [dnum, 2, q_limbs+K, N] NTT Montgomery
    # Q limbs present in ``data`` (None = the context's full L).  A key
    # modulo a PREFIX of the chain is still a valid switching key — ops at
    # level n_q only read limbs [0:n_q] + the special limbs, so keys can be
    # sliced to a stage's working level to bound HBM (see slice_kswitch).
    q_limbs: int | None = None


@dataclasses.dataclass
class GaloisKeys:
    keys: dict                # galois element -> KSwitchKey
    perms: dict               # galois element -> np [N] NTT-domain gather index

    @property
    def q_limbs(self) -> int | None:
        """Common Q-limb count of all keys.  Heterogeneously sliced key
        dicts would mis-slice in Evaluator._key_rows, so uniformity is an
        invariant (ADVICE r4): assert it here."""
        vals = {k.q_limbs for k in self.keys.values()}
        assert len(vals) <= 1, \
            f"GaloisKeys sliced non-uniformly: q_limbs set {vals}"
        return next(iter(vals)) if vals else None


def slice_kswitch(key: KSwitchKey, n_q: int, L: int) -> KSwitchKey:
    """Restrict a switching key to Q limbs [0:n_q] (+ all special limbs).
    Valid because RLWE relations hold mod any prefix product of the chain;
    used to keep per-stage key residency proportional to the stage level."""
    cur = key.q_limbs if key.q_limbs is not None else L
    if n_q >= cur:
        return key
    d = key.data
    import jax.numpy as _jnp
    mod = _jnp if isinstance(d, jax.Array) else np
    return KSwitchKey(
        mod.concatenate([d[..., :n_q, :], d[..., cur:, :]], axis=-2),
        q_limbs=n_q)


def slice_galois(gks: GaloisKeys, n_q: int, L: int) -> GaloisKeys:
    return GaloisKeys(
        {g: slice_kswitch(k, n_q, L) for g, k in gks.keys.items()},
        gks.perms)


def power_of_two_steps(n_slots: int) -> list[int]:
    """The +-2^k rotation-step set: with NAF decomposition (Evaluator.
    rotate) it reaches ANY step in <= ceil(log2 n)/2 expected key-switches
    (SEAL's default galois key set, galois.cpp get_elts_all analog)."""
    steps = set()
    k = 1
    while k < n_slots:
        steps.add(k)
        steps.add(n_slots - k)        # == -2^j mod n
        k <<= 1
    return sorted(steps)


class KeyGenerator:
    def __init__(self, ctx: Context, seed: int | None = 0):
        self.ctx = ctx
        # SHAKE-256 DRBG (reference: Blake2/SHAKE randomgen stack,
        # util/fips202.c); deterministic per seed, os.urandom when None
        from .csprng import ShakeRng
        self.rng = ShakeRng(seed)
        self.tbd = ctx.device()["ntt"]
        self._ntt_all = jax.jit(lambda x: ntt(x, self.tbd))
        self._ntt_q = jax.jit(lambda x: ntt(x, self.tbd, limb_slice=(0, ctx.L)))

        # one fused dispatch per key-switch digit (b = -(a s) + e + fac*t);
        # the eager op-by-op form cost ~5 tunnel round-trips per digit and
        # dominated keygen wall time on the remote TPU
        q = jnp.asarray(ctx.ntt.q).reshape(-1, 1)
        qneg = jnp.asarray(ctx.ntt.qneg_inv).reshape(-1, 1)

        def _digit(a, e_coeff_mont, target_ntt, facj, s_ntt):
            e_ntt = ntt(e_coeff_mont, self.tbd)
            b = ma.add_mod(ma.neg_mod(
                ma.mont_mul(a, s_ntt, q, qneg), q), e_ntt, q)
            b = ma.add_mod(b, ma.mont_mul(target_ntt, facj, q, qneg), q)
            return jnp.stack([b, a])

        self._digit_jit = jax.jit(_digit)
        self.sk = self._gen_secret()

    # -- samplers (host) --------------------------------------------------
    def _ternary(self) -> np.ndarray:
        N = self.ctx.cfg.N
        h = self.ctx.cfg.hamming_weight
        s = np.zeros(N, dtype=np.int64)
        if h and h > 0:
            idx = self.rng.choice(N, size=h, replace=False)
            s[idx] = self.rng.choice(np.array([-1, 1]), size=h)
        else:
            s = self.rng.integers(-1, 2, size=N).astype(np.int64)
        return s

    def _gauss(self) -> np.ndarray:
        return np.round(self.rng.normal(
            0.0, self.ctx.cfg.noise_std, self.ctx.cfg.N)).astype(np.int64)

    def _uniform_ntt(self, n_limbs_lo: int, n_limbs_hi: int) -> np.ndarray:
        """Uniform poly sampled directly in the NTT domain, Montgomery form."""
        primes = self.ctx.all_primes[n_limbs_lo:n_limbs_hi]
        N = self.ctx.cfg.N
        out = np.empty((len(primes), N), dtype=np.uint32)
        for i, q in enumerate(primes):
            r = self.rng.integers(0, 1 << 62, size=N, dtype=np.uint64)
            out[i] = (r % np.uint64(q)).astype(np.uint32)
        return out

    # -- secret key -------------------------------------------------------
    def _gen_secret(self) -> SecretKey:
        s = self._ternary()
        res = _residues(s, self.ctx.all_primes)
        s_ntt = self._ntt_all(jnp.asarray(_to_mont_host(res, self.ctx.all_primes)))
        return SecretKey(coeffs=s, s_ntt=s_ntt)

    # -- public key -------------------------------------------------------
    def gen_public_key(self) -> PublicKey:
        ctx = self.ctx
        L = ctx.L
        a = jnp.asarray(self._uniform_ntt(0, L))
        e = _residues(self._gauss(), ctx.q_primes)
        e_ntt = self._ntt_q(jnp.asarray(_to_mont_host(e, ctx.q_primes)))
        q = jnp.asarray(ctx.ntt.q[:L]).reshape(-1, 1)
        qneg = jnp.asarray(ctx.ntt.qneg_inv[:L]).reshape(-1, 1)
        b = ma.add_mod(ma.neg_mod(
            ma.mont_mul(a, self.sk.s_ntt[:L], q, qneg), q), e_ntt, q)
        return PublicKey(data=jnp.stack([b, a]))

    # -- key-switching keys ----------------------------------------------
    def _gen_kswitch(self, target_ntt: jax.Array) -> KSwitchKey:
        """Key encrypting P*gamma_d*target per digit; target in NTT mont,
        shape [L+K, N] over the full basis."""
        ctx = self.ctx
        nall = ctx.L + ctx.K
        N = ctx.cfg.N
        q = jnp.asarray(ctx.ntt.q).reshape(-1, 1)
        qneg = jnp.asarray(ctx.ntt.qneg_inv).reshape(-1, 1)
        keys = []
        P = ctx.P_int
        for d, (lo, hi) in enumerate(ctx.digit_ranges):
            D = 1
            for i in range(lo, hi):
                D *= ctx.q_primes[i]
            Q = 1
            for p in ctx.q_primes:
                Q *= p
            hatD = Q // D
            gamma = hatD * pow(hatD % D, -1, D)                # mod Q
            # factor (P*gamma mod q_j) per limb, Montgomery; 0 on P limbs
            fac = np.zeros(nall, dtype=np.uint32)
            for j, qj in enumerate(ctx.q_primes):
                fac[j] = (P % qj) * (gamma % qj) % qj * ((1 << 32) % qj) % qj
            facj = jnp.asarray(fac).reshape(-1, 1)
            a = jnp.asarray(self._uniform_ntt(0, nall))
            e = _residues(self._gauss(), ctx.all_primes)
            keys.append(self._digit_jit(
                a, jnp.asarray(_to_mont_host(e, ctx.all_primes)),
                target_ntt, facj, self.sk.s_ntt))
        return KSwitchKey(data=jnp.stack(keys))

    def gen_relin_key(self) -> KSwitchKey:
        q = jnp.asarray(self.ctx.ntt.q).reshape(-1, 1)
        qneg = jnp.asarray(self.ctx.ntt.qneg_inv).reshape(-1, 1)
        s2 = ma.mont_mul(self.sk.s_ntt, self.sk.s_ntt, q, qneg)
        return self._gen_kswitch(s2)

    # -- Galois -----------------------------------------------------------
    def galois_perm(self, galois_elt: int) -> np.ndarray:
        """NTT-domain gather indices: out[k] = in[perm[k]] applies x->x^g.

        With index t <-> exponent 2t+1, sigma_g(p) evaluated at exponent e
        equals p at e*g, so perm[k] = ((g*(2k+1) mod 2N) - 1) / 2.
        (SEAL: util/galois.cpp apply_galois_ntt.)
        """
        N = self.ctx.cfg.N
        two_n = 2 * N
        k = np.arange(N, dtype=np.int64)
        return ((galois_elt * (2 * k + 1)) % two_n - 1) // 2

    def galois_elt_rotation(self, steps: int) -> int:
        """Galois element rotating slots by ``steps`` (slot j <- slot j+steps)."""
        two_n = 2 * self.ctx.cfg.N
        return pow(5, steps % (self.ctx.cfg.N // 2), two_n)

    def galois_elt_conjugate(self) -> int:
        return 2 * self.ctx.cfg.N - 1

    def gen_galois_keys(self, steps: list[int], conjugate: bool = False
                        ) -> GaloisKeys:
        """Keys for the exact rotation-step set (the reference plans its
        step set the same way: Bootstrapper.cpp:89, test_full_scheme.hpp:436)."""
        elts = [self.galois_elt_rotation(s) for s in steps]
        if conjugate:
            elts.append(self.galois_elt_conjugate())
        keys, perms = {}, {}
        for g in dict.fromkeys(elts):
            perm = self.galois_perm(g)
            # key target: sigma_g^{-1}... keyswitching (sigma_g c1) needs key
            # for sigma_g(s): apply the same NTT-domain permutation to s.
            s_g = jnp.take(self.sk.s_ntt, jnp.asarray(perm), axis=-1)
            keys[g] = self._gen_kswitch(s_g)
            perms[g] = perm
        return GaloisKeys(keys=keys, perms=perms)
