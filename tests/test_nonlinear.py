"""Nonlinear-op tests: exp, inverse, rsqrt, GELU, LayerNorm, softmax.

Oracle: plaintext numpy through decrypt, within polynomial-approximation
tolerances (the reference validates these by inline decrypt-prints,
softmax.hpp:472-526, layernorm.hpp:282-309; here they are assertions).
"""

import numpy as np
import pytest

from moai_tpu.params import CKKSConfig, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator
from moai_tpu.utils.recrypt import Recryptor
from moai_tpu.ops.nonlinear import (exp_taylor, inverse_goldschmidt,
                                    invert_sqrt, gelu, layernorm,
                                    softmax_diag, diag_valid_masks,
                                    fit_gelu_coeffs)
from moai_tpu.ops.packing import pack_batch, unpack_batch

RNG = np.random.default_rng(17)
NUM_X, NUM_ROW = 128, 8


def deep_config():
    return CKKSConfig(logN=11, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                      n_data_levels=13, n_boot_levels=0, dnum=2,
                      hamming_weight=64)


@pytest.fixture(scope="module")
def setup():
    ctx = make_context(deep_config())
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=9)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    rec = Recryptor(encryptor, decryptor)
    return ctx, enc, encryptor, decryptor, ev, rec


def test_exp(setup):
    ctx, enc, encryptor, decryptor, ev, _ = setup
    x = RNG.uniform(-5.0, 0.0, ctx.cfg.slots)
    ct = encryptor.encrypt_values(x)
    out = decryptor.decrypt(exp_taylor(ev, ct)).real
    assert np.max(np.abs(out - np.exp(x))) < 2e-2


def test_inverse(setup):
    ctx, enc, encryptor, decryptor, ev, _ = setup
    x = RNG.uniform(0.2, 1.8, ctx.cfg.slots)
    ct = encryptor.encrypt_values(x)
    out = decryptor.decrypt(inverse_goldschmidt(ev, ct, iters=5)).real
    assert np.max(np.abs(out - 1.0 / x) / np.abs(1.0 / x)) < 1e-2


def test_invert_sqrt(setup):
    ctx, enc, encryptor, decryptor, ev, _ = setup
    x = RNG.uniform(0.3, 1.0, ctx.cfg.slots)
    ct = encryptor.encrypt_values(x)
    out = decryptor.decrypt(
        invert_sqrt(ev, ct, (0.3, 1.0), newton_iters=2, gold_iters=1)).real
    assert np.max(np.abs(out - x ** -0.5) / (x ** -0.5)) < 1e-2


def test_gelu_fit_host():
    c = fit_gelu_coeffs(domain=6.0, degree=16)
    xs = np.linspace(-6, 6, 1001)
    approx = np.polynomial.polynomial.polyval(xs / 6.0, c)
    from scipy.special import erf
    g = 0.5 * xs * (1 + erf(xs / np.sqrt(2)))
    assert np.max(np.abs(approx - g)) < 2e-2


def test_gelu(setup):
    ctx, enc, encryptor, decryptor, ev, _ = setup
    x = RNG.uniform(-5.5, 5.5, ctx.cfg.slots)
    ct = encryptor.encrypt_values(x)
    out = decryptor.decrypt(gelu(ev, ct, domain=6.0, degree=16)).real
    from scipy.special import erf
    g = 0.5 * x * (1 + erf(x / np.sqrt(2)))
    assert np.max(np.abs(out - g)) < 3e-2


def test_layernorm(setup):
    ctx, enc, encryptor, decryptor, ev, _ = setup
    C = 12
    slots = ctx.cfg.slots
    xs = RNG.uniform(-1, 1, (C, slots))
    gamma = RNG.uniform(0.5, 1.5, C)
    beta = RNG.uniform(-0.5, 0.5, C)
    ct = encryptor.encrypt(encryptor.encode(xs))
    d = C * xs - xs.sum(axis=0)
    S = (d ** 2).sum(axis=0)
    dom = (0.8 * S.min(), 1.05 * S.max())
    # newton=2/gold=0 fits the 13-level fixture (full LN consumes
    # 6 + 3*newton + 2*gold levels; gold_iters covered by
    # test_invert_sqrt and the golden LayerNorm test)
    out = decryptor.decrypt(
        layernorm(ev, ct, gamma, beta, dom, newton_iters=2, gold_iters=0)
    ).real
    mu = xs.mean(axis=0)
    sig = xs.std(axis=0)
    want = gamma[:, None] * (xs - mu) / sig + beta[:, None]
    assert np.max(np.abs(out - want)) < 3e-2


def test_softmax_diag(setup):
    ctx, enc, encryptor, decryptor, ev, rec = setup
    slots = ctx.cfg.slots
    assert NUM_X * NUM_ROW == slots
    n_inputs = 3
    lens = np.array([NUM_ROW, NUM_ROW - 2, NUM_ROW - 5])
    # scores for each input: [num_row, num_row]
    scores = RNG.uniform(-2.0, 2.0, (n_inputs, NUM_ROW, NUM_ROW))
    # diagonal packing: diag d slot num_x*k+j = scores[j, k, (k+d)%num_row]
    diag = np.zeros((NUM_ROW, slots))
    for d in range(NUM_ROW):
        k = np.arange(NUM_ROW)
        col = (k + d) % NUM_ROW
        for j in range(n_inputs):
            diag[d, NUM_X * k + j] = scores[j, k, col]
    masks = diag_valid_masks(lens, NUM_X, NUM_ROW, slots)
    ct = encryptor.encrypt(encryptor.encode(diag))
    out = softmax_diag(
        ev, enc, ct, masks, max_val=2.0,
        refresh=lambda s: rec.recrypt(s, n_q=ctx.L),
        inv_iters=11)
    got = decryptor.decrypt(out).real
    # plaintext reference: row softmax over valid columns only
    for j in range(n_inputs):
        L = int(lens[j])
        sc = scores[j, :L, :L]
        e = np.exp(sc - sc.max())
        sm = e / e.sum(axis=1, keepdims=True)
        for d in range(NUM_ROW):
            k = np.arange(L)
            col = (k + d) % NUM_ROW
            ok = col < L
            if not ok.any():      # short inputs: some diagonals are
                continue          # entirely outside the valid block
            want = sm[k[ok], col[ok]]
            gotv = got[d, NUM_X * k[ok] + j]
            assert np.max(np.abs(gotv - want)) < 2e-2, (j, d)
