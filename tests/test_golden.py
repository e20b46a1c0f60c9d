"""Golden-data parity tests against the reference's per-module CSVs.

The reference's real test oracle is its golden intermediate activations
(reference: data/layer_0/**/allresults — 5 valid tokens at every module
boundary; SURVEY.md §4).  The weight matrices were stripped from the
mirror, but the module-boundary pairs that do NOT need weights fully
anchor the numerics of our CCMM / softmax / GELU / LayerNorm pipelines
on real BERT-base data:

    Q.csv, K.csv         -> QKT.csv            (CCMM col->diag, /sqrt(d))
    QKT.csv              -> aftsoftmax.csv     (masked softmax chain)
    aftsoftmax.csv,V.csv -> real_attention.csv (CCMM diag->col)
    intermediate_output_after_linear.csv -> real_intermediate_output.csv
                                            (GELU)
    self_output_residual_connection_before_layernorm.csv + parms gamma/beta
                         -> real_self_output.csv (LayerNorm)
"""

import os

import numpy as np
import pytest

BASE = "/root/reference/data/layer_0"
pytestmark = pytest.mark.skipif(not os.path.isdir(BASE),
                                reason="reference golden data not present")


def csv(rel):
    return np.loadtxt(f"{BASE}/{rel}", delimiter=",", dtype=np.float64)


# --------------------------------------------------------------------------
# host-level approximation-chain parity (fast, no encryption)
# --------------------------------------------------------------------------

def test_softmax_approx_chain_host():
    """The reference softmax pipeline — subtract layer-0 max 7.5, (1+x/128)
    ^128 exp, Goldschmidt inverse iter=16 (softmax.hpp:9-82,324) — on the
    real layer-0 scores, vs the golden softmax output."""
    qkt = csv("Attention/BertSelfAttention/allresults/QKT.csv")
    want = csv("Attention/BertSelfAttention/allresults/aftsoftmax.csv")
    for h in range(12):
        s = qkt[:, h * 5:(h + 1) * 5] - 7.5
        e = (1.0 + s / 128.0) ** 128
        tot = e.sum(-1, keepdims=True) / 8.0     # sum_scale = num_row analog
        y = 1.0 - tot
        inv = 1.0 + y
        for _ in range(16):
            y = y * y
            inv = inv * (1.0 + y)
        got = e * inv / 8.0
        # (1+x/128)^128 has relative error ~x^2/256 at x ~ -7: the
        # measured approximation floor on this data is 0.0247 absolute on
        # the largest entries (head 8) — the reference's encrypted softmax
        # carries the same error (its GLUE parity tolerates it, paper
        # Table 4)
        assert np.abs(got - want[:, h * 5:(h + 1) * 5]).max() < 2.7e-2, h


def test_gelu_fit_on_golden_range():
    """Our host-fitted deg-32 GELU (ops/nonlinear.fit_gelu_cheb — the
    generated analog of gelu_v2's hard-coded table, gelu_others.hpp:23-35;
    degree 32 costs the same Chebyshev-ladder depth as the reference's 24)
    on the real layer-0 FFN activations."""
    from moai_tpu.ops.nonlinear import fit_gelu_cheb
    x = csv("Intermediate/allresults/intermediate_output_after_linear.csv")
    want = csv("Intermediate/allresults/real_intermediate_output.csv")
    dom = 16.0
    assert np.abs(x).max() < dom
    c = fit_gelu_cheb(dom, 32)
    got = np.polynomial.chebyshev.chebval(x / dom, c)
    assert np.abs(got - want).max() < 0.015


def test_layernorm_chain_host():
    """LayerNorm via the d*x-sum / rsqrt(S) formulation (layernorm.hpp:
    157-353) with our Newton+Goldschmidt rsqrt on the real layer-0 data."""
    x = csv("Attention/SelfOutput/allresults/"
            "self_output_residual_connection_before_layernorm.csv")
    want = csv("Attention/SelfOutput/allresults/real_self_output.csv")
    g = csv("Attention/SelfOutput/parms/self_output_LayerNorm_weight.csv")
    b = csv("Attention/SelfOutput/parms/self_output_LayerNorm_bias.csv")
    d = x.shape[1]
    dd = d * x - x.sum(-1, keepdims=True)
    S = (dd * dd).sum(-1, keepdims=True)
    hi = 2.1e8
    from moai_tpu.ops.nonlinear import fit_rsqrt_line
    a0, b0 = fit_rsqrt_line(1.1e8 / hi, 1.0)
    Sn = S / hi
    y = a0 * Sn + b0
    for _ in range(4):
        y = y * (1.5 - 0.5 * Sn * y * y)
    rs = y / np.sqrt(hi)
    got = g * dd * rs * np.sqrt(d) + b
    assert np.abs(got - want).max() < 2e-3


# --------------------------------------------------------------------------
# encrypted module parity (small N, 5 real tokens)
# --------------------------------------------------------------------------

NUM_ROW = 8
LENS = [5]


@pytest.fixture(scope="module")
def he():
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator
    from moai_tpu.encrypt import Encryptor, Decryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ops.matmul import ccmm_col_steps, ccmm_diag_steps

    cfg = CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=18, n_boot_levels=0, dnum=4,
                     hamming_weight=64)
    ctx = make_context(cfg)
    num_x = ctx.cfg.slots // NUM_ROW
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=13)
    steps = sorted(set(ccmm_col_steps(num_x, NUM_ROW)
                       + ccmm_diag_steps(num_x, NUM_ROW)))
    gks = kg.gen_galois_keys(steps=steps)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)
    return ctx, enc, encryptor, decryptor, ev, num_x


def _encrypt_cols(encryptor, mat, num_x, n_q=None):
    """mat [tokens, C] -> col-packed batched ciphertext [C, 2, n_q, N]."""
    from moai_tpu.ops.packing import batch_input
    xs = np.zeros((1, NUM_ROW, mat.shape[1]))
    xs[0, :mat.shape[0]] = mat
    return batch_input(encryptor, xs, num_x, NUM_ROW, n_q=n_q)


def _unpack_cols(decryptor, ct, num_x, rows, cols):
    from moai_tpu.ops.packing import unpack_batch
    slots = decryptor.decrypt(ct).real
    return unpack_batch(slots, num_x, NUM_ROW, 1)[0][:rows, :cols]


def test_ccmm_qkt_golden(he):
    """Encrypted QK^T on the real layer-0 Q/K (head 0) vs the golden QKT
    (reference: ct_ct_matrix_mul_colpacking, Ct_ct_matrix_mul.hpp:5)."""
    import jax
    from moai_tpu.ops.matmul import ccmm_col_to_diag
    ctx, enc, encryptor, decryptor, ev, num_x = he
    Q = csv("Attention/BertSelfAttention/allresults/Q.csv")[:, :64]
    K = csv("Attention/BertSelfAttention/allresults/K.csv")[:, :64]
    want = csv("Attention/BertSelfAttention/allresults/QKT.csv")[:, :5]
    q_ct = _encrypt_cols(encryptor, Q / 8.0, num_x)    # fold 1/sqrt(d)
    k_ct = _encrypt_cols(encryptor, K, num_x)
    out = jax.jit(lambda a, b: ccmm_col_to_diag(ev, a, b, num_x, NUM_ROW)
                  )(q_ct, k_ct)
    # out: diagonal-packed [NUM_ROW, ...]; diag d slot num_x*k+j = S[k, k+d]
    slots = decryptor.decrypt(out).real
    got = np.zeros((5, 5))
    for dctr in range(NUM_ROW):
        for k in range(5):
            c = (k + dctr) % NUM_ROW
            if c < 5:
                got[k, c] = slots[dctr, num_x * k]
    assert np.abs(got - want).max() < 2e-3


@pytest.mark.slow
def test_softmax_golden(he):
    """Encrypted masked softmax on the real layer-0 head-0 scores vs the
    golden aftsoftmax (reference: softmax_boot, softmax.hpp:308; the
    refresh slot is identity here — depth is in-budget at test scale).
    Slow: the 17-level exp/inverse chain dominates fast-suite compile."""
    from moai_tpu.ops.nonlinear import softmax_diag, diag_valid_masks
    from moai_tpu.ciphertext import Ciphertext
    ctx, enc, encryptor, decryptor, ev, num_x = he
    qkt = csv("Attention/BertSelfAttention/allresults/QKT.csv")[:, :5]
    want = csv("Attention/BertSelfAttention/allresults/aftsoftmax.csv")[:, :5]
    slots = ctx.cfg.slots
    # diagonal-pack the scores: diag d, slot num_x*k+0 = S[k, (k+d) % R]
    diag = np.zeros((NUM_ROW, slots))
    for dctr in range(NUM_ROW):
        for k in range(5):
            c = (k + dctr) % NUM_ROW
            if c < 5:
                diag[dctr, num_x * k] = qkt[k, c]
    import jax
    masks = diag_valid_masks(LENS, num_x, NUM_ROW, slots)
    ct = encryptor.encrypt(encryptor.encode(diag))
    # head-0 row sums of exp(x-7.5) lie in [0.0035, 0.020] (real data):
    # sum_scale=0.025 puts them in [0.14, 0.8] so 6 Goldschmidt iterations
    # converge (the reference burns iter=16 at its fixed sum_scale,
    # softmax.hpp:86)
    out = jax.jit(lambda c: softmax_diag(
        ev, enc, c, masks, max_val=7.5, refresh=lambda x: x,
        inv_iters=6, sum_scale=0.025, exp_r=7))(ct)
    got_slots = decryptor.decrypt(out).real
    got = np.zeros((5, 5))
    for dctr in range(NUM_ROW):
        for k in range(5):
            c = (k + dctr) % NUM_ROW
            if c < 5:
                got[k, c] = got_slots[dctr, num_x * k]
    # tolerance = the exp-approximation floor (see
    # test_softmax_approx_chain_host) + CKKS noise
    assert np.abs(got - want).max() < 2.5e-2


def test_ccmm_attention_out_golden(he):
    """Encrypted softmax*V (diag->col BSGS CCMM) on real layer-0 data vs
    the golden real_attention (reference: ct_ct_matrix_mul_diagpacking,
    Ct_ct_matrix_mul.hpp:57)."""
    from moai_tpu.ops.matmul import ccmm_diag_to_col
    ctx, enc, encryptor, decryptor, ev, num_x = he
    aft = csv("Attention/BertSelfAttention/allresults/aftsoftmax.csv")[:, :5]
    V = csv("Attention/BertSelfAttention/allresults/V.csv")[:, :64]
    want = csv("Attention/BertSelfAttention/allresults/"
               "real_attention.csv")[:, :64]
    slots = ctx.cfg.slots
    diag = np.zeros((NUM_ROW, slots))
    for dctr in range(NUM_ROW):
        for k in range(5):
            c = (k + dctr) % NUM_ROW
            if c < 5:
                diag[dctr, num_x * k] = aft[k, c]
    import jax
    sm_ct = encryptor.encrypt(encryptor.encode(diag))
    v_ct = _encrypt_cols(encryptor, V, num_x)
    out = jax.jit(lambda a, b: ccmm_diag_to_col(ev, a, b, num_x, NUM_ROW)
                  )(sm_ct, v_ct)
    got = _unpack_cols(decryptor, out, num_x, 5, 64)
    assert np.abs(got - want).max() < 2e-3


def test_gelu_golden(he):
    """Encrypted deg-24 GELU on real layer-0 FFN activations (128-column
    subset; GELU is per-element so a column subset is a faithful check)
    vs the golden output (reference: gelu_v2, gelu_others.hpp:4)."""
    from moai_tpu.ops.nonlinear import gelu
    ctx, enc, encryptor, decryptor, ev, num_x = he
    x = csv("Intermediate/allresults/"
            "intermediate_output_after_linear.csv")[:, :128]
    want = csv("Intermediate/allresults/"
               "real_intermediate_output.csv")[:, :128]
    import jax
    ct = _encrypt_cols(encryptor, x, num_x)
    out = jax.jit(lambda c: gelu(ev, c, domain=16.0, degree=32))(ct)
    got = _unpack_cols(decryptor, out, num_x, 5, 128)
    assert np.abs(got - want).max() < 0.02


@pytest.mark.slow
def test_layernorm_golden(he):
    """Encrypted LayerNorm over all 768 real columns vs the golden
    real_self_output (reference: layernorm, layernorm.hpp:157)."""
    from moai_tpu.ops.nonlinear import layernorm
    ctx, enc, encryptor, decryptor, ev, num_x = he
    x = csv("Attention/SelfOutput/allresults/"
            "self_output_residual_connection_before_layernorm.csv")
    want = csv("Attention/SelfOutput/allresults/real_self_output.csv")
    g = csv("Attention/SelfOutput/parms/self_output_LayerNorm_weight.csv")
    b = csv("Attention/SelfOutput/parms/self_output_LayerNorm_bias.csv")
    import jax
    ct = _encrypt_cols(encryptor, x, num_x)
    out = jax.jit(lambda c: layernorm(ev, c, g, b,
                                      var_domain=(1.1e8, 2.1e8),
                                      newton_iters=4, gold_iters=1))(ct)
    got = _unpack_cols(decryptor, out, num_x, 5, 768)
    assert np.abs(got - want).max() < 5e-3


# --------------------------------------------------------------------------
# all-12-layer anchoring (VERDICT r3 item 6): the same approximation
# chains, with per-layer calibrated domains (our framework's explicit-
# domain design; the reference ships one hard-coded constant table,
# softmax.hpp:324, and a fixed GELU fit domain that layers 2/3/10
# actually exceed — on those layers the reference's own approximations
# deviate from the plaintext goldens far more than ours below)
# --------------------------------------------------------------------------

def csv_l(layer, rel):
    return np.loadtxt(f"/root/reference/data/layer_{layer}/{rel}",
                      delimiter=",", dtype=np.float64)


@pytest.mark.parametrize("layer", range(12))
def test_softmax_chain_all_layers_host(layer):
    """exp-by-squaring + Goldschmidt softmax with per-head calibrated max
    on every layer's real scores (measured floor 0.069, layer 2)."""
    qkt = csv_l(layer, "Attention/BertSelfAttention/allresults/QKT.csv")
    want = csv_l(layer,
                 "Attention/BertSelfAttention/allresults/aftsoftmax.csv")
    for h in range(12):
        sc = qkt[:, h * 5:(h + 1) * 5]
        s = sc - sc.max()
        e = (1.0 + s / 128.0) ** 128
        tot = e.sum(-1, keepdims=True) / 8.0
        y = 1.0 - tot
        inv = 1.0 + y
        for _ in range(16):
            y = y * y
            inv = inv * (1.0 + y)
        got = e * inv / 8.0
        assert np.abs(got - want[:, h * 5:(h + 1) * 5]).max() < 8e-2, \
            (layer, h)


@pytest.mark.parametrize("layer", range(12))
def test_gelu_fit_all_layers_host(layer):
    """Chebyshev GELU with per-layer calibrated domain; wide-domain layers
    (|x| up to 124, layer 10) use degree 128 — same BSGS depth class, two
    more levels than degree 32.  Measured floors: <=0.024 narrow,
    0.093 at layer 10 (where the reference's fixed deg-24 monomial fit
    diverges entirely, gelu_others.hpp:23-35)."""
    from moai_tpu.ops.nonlinear import fit_gelu_cheb
    x = csv_l(layer,
              "Intermediate/allresults/intermediate_output_after_linear.csv")
    want = csv_l(layer,
                 "Intermediate/allresults/real_intermediate_output.csv")
    dom = float(np.ceil(np.abs(x).max())) + 1
    deg, tol = (32, 3e-2) if dom <= 20 else (128, 0.12)
    c = fit_gelu_cheb(dom, deg)
    got = np.polynomial.chebyshev.chebval(x / dom, c)
    assert np.abs(got - want).max() < tol, layer


@pytest.mark.parametrize("layer", range(12))
def test_layernorm_chain_all_layers_host(layer):
    """LayerNorm rsqrt chain with the relative-minimax Chebyshev init
    (ops/nonlinear.fit_rsqrt_cheb) on every layer's real variance spread —
    layers 10/11 have hi/lo up to ~45, where the linear init diverges."""
    from moai_tpu.ops.nonlinear import fit_rsqrt_cheb
    x = csv_l(layer, "Attention/SelfOutput/allresults/"
              "self_output_residual_connection_before_layernorm.csv")
    want = csv_l(layer,
                 "Attention/SelfOutput/allresults/real_self_output.csv")
    g = csv_l(layer,
              "Attention/SelfOutput/parms/self_output_LayerNorm_weight.csv")
    b = csv_l(layer,
              "Attention/SelfOutput/parms/self_output_LayerNorm_bias.csv")
    d = x.shape[1]
    dd = d * x - x.sum(-1, keepdims=True)
    S = (dd * dd).sum(-1, keepdims=True)
    hi = 1.05 * S.max()
    lo = 0.9 * S.min() / hi
    Sn = S / hi
    t = 2 * (Sn - lo) / (1.0 - lo) - 1
    c = fit_rsqrt_cheb(lo, 1.0, degree=7)
    y = np.polynomial.chebyshev.chebval(t, c)
    for _ in range(2):
        y = y * (1.5 - 0.5 * Sn * y * y)
    rs = y / np.sqrt(hi)
    got = g * dd * rs * np.sqrt(d) + b
    assert np.abs(got - want).max() < 2e-3, layer
