"""Bootstrapping tests: ModRaise exactness, i-monomial multiply, the
CoeffToSlot/SlotToCoeff matrices, BSGS diagonal apply, and the full
pipeline (oracle: bootstrap(ct) ~= ct, SURVEY.md §7.2 step 7)."""

import numpy as np
import pytest

from moai_tpu.params import CKKSConfig, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator
from moai_tpu.boot.linear import (matrix_diagonals, bsgs_steps,
                                  apply_diagonals, c2s_matrix, s2c_matrix,
                                  embedding_matrix)
from moai_tpu.boot.bootstrap import Bootstrapper

RNG = np.random.default_rng(77)


def boot_config():
    return CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                      n_data_levels=13, n_boot_levels=0, dnum=7,
                      special_bits=29.5, hamming_weight=64)


@pytest.fixture(scope="module")
def setup():
    ctx = make_context(boot_config())
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=101)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc)
    gks = kg.gen_galois_keys(steps=bt.galois_steps(), conjugate=True)
    ev.galois_keys = gks
    return ctx, enc, encryptor, decryptor, ev, bt


def test_embedding_matrix_host(setup):
    ctx, enc, *_ = setup
    n, N = enc.slots, enc.N
    c = RNG.uniform(-1, 1, N)
    u = c[:n] + 1j * c[n:]
    slots = enc.embed_to_slots(c)
    A = embedding_matrix(enc)
    assert np.max(np.abs(A @ u - slots)) < 1e-8
    # inverse is A^H/n
    assert np.max(np.abs(c2s_matrix(enc) @ slots - u)) < 1e-8
    assert np.max(np.abs(s2c_matrix(enc) @ u - slots)) < 1e-8


def test_modraise_exact(setup):
    ctx, enc, encryptor, decryptor, ev, bt = setup
    v = RNG.uniform(-1, 1, ctx.cfg.slots)
    ct = encryptor.encrypt_values(v, n_q=ctx.n_q0)
    raised = bt.modraise(ct)
    assert raised.n_q == ctx.L
    r_bot = decryptor.decrypt_to_residues(ct)
    r_full = decryptor.decrypt_to_residues(raised)
    # the raised ciphertext decrypts to a poly congruent mod q0, exactly
    assert np.array_equal(r_full[: ctx.n_q0], r_bot)


def test_mul_i(setup):
    ctx, enc, encryptor, decryptor, ev, bt = setup
    v = RNG.uniform(-1, 1, ctx.cfg.slots) + 1j * RNG.uniform(-1, 1,
                                                             ctx.cfg.slots)
    ct = encryptor.encrypt_values(v)
    out = decryptor.decrypt(bt.mul_i(ct))
    assert np.max(np.abs(out - 1j * v)) < 1e-5


def test_apply_diagonals(setup):
    ctx, enc, encryptor, decryptor, ev, bt = setup
    n = enc.slots
    # sparse random complex matrix on a few diagonals
    diags = {d: RNG.uniform(-1, 1, n) + 1j * RNG.uniform(-1, 1, n)
             for d in [0, 1, 5, 16, 17, 200]}
    M = np.zeros((n, n), complex)
    idx = np.arange(n)
    for d, vec in diags.items():
        M[idx, (idx + d) % n] = vec
    v = RNG.uniform(-1, 1, n) + 1j * RNG.uniform(-1, 1, n)
    ct = encryptor.encrypt_values(v)
    out = decryptor.decrypt(apply_diagonals(ev, enc, ct, diags))
    assert np.max(np.abs(out - M @ v)) < 1e-4


@pytest.mark.slow
def test_bootstrap_end_to_end(setup):
    ctx, enc, encryptor, decryptor, ev, bt = setup
    v = RNG.uniform(-0.8, 0.8, ctx.cfg.slots)
    ct = encryptor.encrypt_values(v, n_q=ctx.n_q0)
    out = bt(ct)
    assert out.n_q >= ctx.n_q0 + 2
    got = decryptor.decrypt(out)
    err = np.max(np.abs(got.real - v))
    assert err < 5e-4, err
    assert np.max(np.abs(got.imag)) < 5e-4


def test_factor_levels_host(setup):
    """Radix factorization: product of butterfly levels == A @ Pi for a
    permutation Pi; c2s and s2c levels compose to the identity; grouping
    preserves the product."""
    from moai_tpu.boot.linear import (s2c_apply_levels, c2s_apply_levels,
                                      group_apply_levels)
    ctx, enc, *_ = setup
    n = enc.slots

    def dense(lev):
        M = np.zeros((n, n), complex)
        idx = np.arange(n)
        for d, v in lev.items():
            M[idx, (idx + d) % n] = v
        return M

    def product(levels):
        P = np.eye(n, dtype=complex)
        for L in levels:
            P = dense(L) @ P
        return P

    s2c = s2c_apply_levels(enc)
    c2s = c2s_apply_levels(enc)
    P_s2c, P_c2s = product(s2c), product(c2s)
    A = embedding_matrix(enc)
    Pi = A.conj().T @ P_s2c / n
    oh = np.abs(Pi) > 0.5
    assert (oh.sum(0) == 1).all() and (oh.sum(1) == 1).all()
    assert np.allclose(Pi[oh], 1, atol=1e-8)
    assert np.allclose(P_s2c @ P_c2s, np.eye(n), atol=1e-7)
    assert np.allclose(product(group_apply_levels(s2c, 3)), P_s2c,
                       atol=1e-7)
    assert np.allclose(product(group_apply_levels(c2s, 3)), P_c2s,
                       atol=1e-7)


@pytest.mark.slow
def test_bootstrap_factored():
    """Full pipeline with radix-factored (grouped) linear transforms —
    the memory-feasible configuration for flagship n."""
    cfg = CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=19, n_boot_levels=0, dnum=7,
                     special_bits=29.5, hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=202)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc, lt_group=2)
    ev.galois_keys = kg.gen_galois_keys(steps=bt.galois_steps(),
                                        conjugate=True)
    v = RNG.uniform(-0.8, 0.8, ctx.cfg.slots)
    ct = encryptor.encrypt_values(v, n_q=ctx.n_q0)
    out = bt(ct)
    got = decryptor.decrypt(out)
    err = np.max(np.abs(got.real - v))
    assert err < 5e-4, err
