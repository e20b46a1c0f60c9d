"""Nonlinear-op tests: exp, inverse, rsqrt, GELU, LayerNorm, softmax.

Oracle: plaintext numpy through decrypt, within polynomial-approximation
tolerances (the reference validates these by inline decrypt-prints,
softmax.hpp:472-526, layernorm.hpp:282-309; here they are assertions).

Every encrypted circuit is JITTED: eager per-op dispatch dominated this
file's runtime (15 of the fast tier's 21 minutes in r3); compiled+cached
circuits run in seconds and recompile only when the code changes.
"""

import jax
import numpy as np
import pytest

from moai_tpu.params import CKKSConfig, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator
from moai_tpu.ciphertext import Ciphertext
from moai_tpu.ops.nonlinear import (exp_taylor, inverse_goldschmidt,
                                    invert_sqrt, invert_sqrt_cheb, gelu,
                                    layernorm, softmax_exp_sum,
                                    softmax_finish, diag_valid_masks,
                                    fit_gelu_coeffs)

RNG = np.random.default_rng(17)
NUM_X, NUM_ROW = 64, 8


def deep_config():
    # logN=10 (512 slots) keeps the circuits small; 22 levels cover the
    # deepest chains (layernorm 14-15; softmax phases of 9 and 13 levels
    # around the harness recrypt)
    return CKKSConfig(logN=10, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                      n_data_levels=22, n_boot_levels=0, dnum=2,
                      hamming_weight=64)


@pytest.fixture(scope="module")
def setup():
    ctx = make_context(deep_config())
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=9)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    from moai_tpu.utils.recrypt import Recryptor
    rec = Recryptor(encryptor, decryptor)
    return ctx, enc, encryptor, decryptor, ev, rec


def run_jit(ev, encryptor, decryptor, x, circuit, n_q=None):
    """Encrypt x, run ``circuit`` (Ciphertext -> Ciphertext) under jit,
    decrypt."""
    ct = encryptor.encrypt(encryptor.encode(x, n_q=n_q))
    out = jax.jit(lambda d: circuit(Ciphertext(d, ct.scale, True)))(ct.data)
    return decryptor.decrypt(out).real


def test_exp(setup):
    ctx, enc, encryptor, decryptor, ev, rec = setup
    x = RNG.uniform(-5.0, 0.0, ctx.cfg.slots)
    out = run_jit(ev, encryptor, decryptor, x,
                  lambda c: exp_taylor(ev, c), n_q=ctx.n_q0 + 20)
    assert np.max(np.abs(out - np.exp(x))) < 2e-2


def test_inverse(setup):
    ctx, enc, encryptor, decryptor, ev, rec = setup
    x = RNG.uniform(0.2, 1.8, ctx.cfg.slots)
    out = run_jit(ev, encryptor, decryptor, x,
                  lambda c: inverse_goldschmidt(ev, c, iters=5),
                  n_q=ctx.n_q0 + 14)
    assert np.max(np.abs(out - 1.0 / x) / np.abs(1.0 / x)) < 1e-2


def test_invert_sqrt(setup):
    ctx, enc, encryptor, decryptor, ev, rec = setup
    x = RNG.uniform(0.3, 1.0, ctx.cfg.slots)
    out = run_jit(ev, encryptor, decryptor, x,
                  lambda c: invert_sqrt(ev, c, (0.3, 1.0), newton_iters=2,
                                        gold_iters=1),
                  n_q=ctx.n_q0 + 22)
    assert np.max(np.abs(out - x ** -0.5) / (x ** -0.5)) < 1e-2


def test_invert_sqrt_cheb_wide(setup):
    """Wide-domain rsqrt (hi/lo = 50) via the relative-minimax Chebyshev
    init — the range where the linear init diverges under Newton (real
    BERT layer-10/11 variance spread, tests/test_golden.py)."""
    ctx, enc, encryptor, decryptor, ev, rec = setup
    x = RNG.uniform(0.02, 1.0, ctx.cfg.slots)
    out = run_jit(ev, encryptor, decryptor, x,
                  lambda c: invert_sqrt_cheb(ev, c, (0.02, 1.0), degree=7,
                                             newton_iters=2),
                  n_q=ctx.n_q0 + 26)
    assert np.max(np.abs(out - x ** -0.5) / (x ** -0.5)) < 2e-3


def test_gelu_fit_host():
    c = fit_gelu_coeffs(domain=6.0, degree=16)
    xs = np.linspace(-6, 6, 1001)
    approx = np.polynomial.polynomial.polyval(xs / 6.0, c)
    from scipy.special import erf
    g = 0.5 * xs * (1 + erf(xs / np.sqrt(2)))
    assert np.max(np.abs(approx - g)) < 2e-2


def test_gelu(setup):
    ctx, enc, encryptor, decryptor, ev, rec = setup
    x = RNG.uniform(-5.5, 5.5, ctx.cfg.slots)
    out = run_jit(ev, encryptor, decryptor, x,
                  lambda c: gelu(ev, c, domain=6.0, degree=16),
                  n_q=ctx.n_q0 + 18)
    from scipy.special import erf
    g = 0.5 * x * (1 + erf(x / np.sqrt(2)))
    assert np.max(np.abs(out - g)) < 3e-2


def test_layernorm(setup):
    ctx, enc, encryptor, decryptor, ev, rec = setup
    C = 12
    slots = ctx.cfg.slots
    xs = RNG.uniform(-1, 1, (C, slots))
    gamma = RNG.uniform(0.5, 1.5, C)
    beta = RNG.uniform(-0.5, 0.5, C)
    d = C * xs - xs.sum(axis=0)
    S = (d ** 2).sum(axis=0)
    dom = (0.8 * S.min(), 1.05 * S.max())
    out = run_jit(
        ev, encryptor, decryptor, xs,
        lambda c: layernorm(ev, c, gamma, beta, dom, newton_iters=2,
                            gold_iters=1, col_chunk=5),
        n_q=ctx.n_q0 + 30)
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
    # two jitted phases around a harness recrypt of the single sum
    # ciphertext (the reference bootstraps it there, softmax.hpp:529-536)
    n_q1 = ctx.n_q0 + 20           # exp 8 + mask 1 levels (+ margin)
    ct = encryptor.encrypt(encryptor.encode(diag, n_q=n_q1))
    e_ct, s_ct = jax.jit(lambda d: softmax_exp_sum(
        ev, enc, Ciphertext(d, ct.scale, True), masks, max_val=2.0)
    )(ct.data)
    # +28: the 11-iter inverse's scale drifts ~x57 (see inverse_goldschmidt
    # docstring) — the output must land ABOVE the bottom q0 level so
    # m*scale stays inside the modulus
    s_ct = rec.recrypt(s_ct, n_q=ctx.n_q0 + 28)
    out = jax.jit(lambda e_, s_: softmax_finish(ev, e_, s_, inv_iters=11)
                  )(e_ct, s_ct)
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
