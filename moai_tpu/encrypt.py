"""Encryptor / Decryptor — client-side RLWE encryption around device NTT.

TPU-native counterpart of SEAL's Encryptor/Decryptor (reference:
thirdparty/SEAL-4.1-bs/native/src/seal/encryptor.cpp, decryptor.cpp).
Decryption lives strictly on the client/test-harness side — unlike the
reference, which threads the secret key through op code for debug prints
(e.g. softmax.hpp:309), no evaluator op here ever sees ``SecretKey``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import mod_arith as ma
from .params import Context
from .ciphertext import Ciphertext, Plaintext
from .encoder import Encoder
from .keys import KeyGenerator, PublicKey, SecretKey, _residues, _to_mont_host
from .ntt import ntt, intt


class Encryptor:
    def __init__(self, ctx: Context, encoder: Encoder, pk: PublicKey,
                 keygen: KeyGenerator):
        self.ctx = ctx
        self.encoder = encoder
        self.pk = pk
        from .csprng import ShakeRng
        self.rng = ShakeRng(int(keygen.rng.integers(1 << 62)))
        self.tbd = ctx.device()["ntt"]
        self._enc_jit = {}

    def encode(self, vals, scale: float | None = None,
               n_q: int | None = None) -> Plaintext:
        """Host-encode to a device Plaintext (NTT Montgomery)."""
        ctx = self.ctx
        n_q = n_q if n_q is not None else ctx.L
        res = self.encoder.encode(vals, scale=scale, n_q=n_q)
        mont = _to_mont_host(res, ctx.q_primes[:n_q])
        fn = self._jit_ntt(n_q, mont.ndim)
        return Plaintext(data=fn(jnp.asarray(mont)),
                         scale=float(scale if scale is not None else ctx.scale))

    def _jit_ntt(self, n_q, ndim):
        key = (n_q, ndim)
        if key not in self._enc_jit:
            self._enc_jit[key] = jax.jit(
                lambda x: ntt(x, self.tbd, limb_slice=(0, n_q)))
        return self._enc_jit[key]

    def encrypt(self, pt: Plaintext) -> Ciphertext:
        """Public-key encrypt: (u*pk0 + e0 + m, u*pk1 + e1).  Fresh
        randomness per leading batch element."""
        ctx = self.ctx
        n_q = pt.n_q
        L = ctx.L
        bshape = pt.data.shape[:-2]
        u = _residues(self.rng.choice(np.array([-1, 0, 1]),
                                      size=bshape + (ctx.cfg.N,)),
                      ctx.q_primes)
        e0 = _residues(np.round(self.rng.normal(
            0, ctx.cfg.noise_std, bshape + (ctx.cfg.N,))).astype(np.int64),
                       ctx.q_primes)
        e1 = _residues(np.round(self.rng.normal(
            0, ctx.cfg.noise_std, bshape + (ctx.cfg.N,))).astype(np.int64),
                       ctx.q_primes)
        fn = self._jit_ntt(L, 2)
        u_ntt = fn(jnp.asarray(_to_mont_host(u, ctx.q_primes)))
        e0_ntt = fn(jnp.asarray(_to_mont_host(e0, ctx.q_primes)))
        e1_ntt = fn(jnp.asarray(_to_mont_host(e1, ctx.q_primes)))
        q = jnp.asarray(ctx.ntt.q[:L]).reshape(-1, 1)
        qneg = jnp.asarray(ctx.ntt.qneg_inv[:L]).reshape(-1, 1)
        c0 = ma.add_mod(ma.mont_mul(u_ntt, self.pk.data[0], q, qneg), e0_ntt, q)
        c1 = ma.add_mod(ma.mont_mul(u_ntt, self.pk.data[1], q, qneg), e1_ntt, q)
        # drop to the plaintext's level, add message
        c0 = ma.add_mod(c0[..., :n_q, :], pt.data, q[:n_q])
        c1 = c1[..., :n_q, :]
        return Ciphertext(data=jnp.stack([c0, c1], axis=-3), scale=pt.scale)

    def encrypt_values(self, vals, scale: float | None = None,
                       n_q: int | None = None) -> Ciphertext:
        return self.encrypt(self.encode(vals, scale=scale, n_q=n_q))


class Decryptor:
    """Test-harness decryption; also provides the reference's role of
    inline decrypt-prints (softmax.hpp:472-502) as an *external* oracle."""

    def __init__(self, ctx: Context, encoder: Encoder, sk: SecretKey):
        self.ctx = ctx
        self.encoder = encoder
        self.sk = sk
        self.tbd = ctx.device()["ntt"]
        self._jit = {}

    def _decrypt_fn(self, n_polys, n_q, batch_shape):
        key = (n_polys, n_q, batch_shape)
        if key not in self._jit:
            ctx = self.ctx
            q = jnp.asarray(ctx.ntt.q[:n_q]).reshape(-1, 1)
            qneg = jnp.asarray(ctx.ntt.qneg_inv[:n_q]).reshape(-1, 1)
            s = self.sk.s_ntt[:n_q]

            def fn(data):
                acc = data[..., 0, :, :]
                spow = s
                for j in range(1, n_polys):
                    acc = ma.add_mod(
                        acc, ma.mont_mul(data[..., j, :, :], spow, q, qneg), q)
                    if j + 1 < n_polys:
                        spow = ma.mont_mul(spow, s, q, qneg)
                coeff = intt(acc, self.tbd, limb_slice=(0, n_q))
                return ma.from_mont(coeff, q, qneg)

            self._jit[key] = jax.jit(fn)
        return self._jit[key]

    def decrypt_to_residues(self, ct: Ciphertext) -> np.ndarray:
        fn = self._decrypt_fn(ct.n_polys, ct.n_q, ct.batch_shape)
        return np.asarray(fn(ct.data))

    def decrypt(self, ct: Ciphertext) -> np.ndarray:
        """-> complex slot values [..., N/2]."""
        res = self.decrypt_to_residues(ct)
        return self.encoder.decode(res, ct.scale, n_q=ct.n_q)
