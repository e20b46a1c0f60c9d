"""Encrypted matmul tests: packing, modmat (MXU digit path), CPMM, CCMM.

Oracle: plaintext numpy linear algebra through pack/unpack, mirroring the
reference's staged drivers (reference: include/test/matrix_mul/
test_ct_pt_matrix_mul.hpp, test_ct_ct_matrix_mul.hpp) but with programmatic
assertions instead of printed eyeballing.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from moai_tpu.params import test_config as _test_config, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator
from moai_tpu.ops.packing import pack_batch, unpack_batch, batch_input, bias_vec
from moai_tpu.ops.matmul import (CPMM, ccmm_col_to_diag, ccmm_diag_to_col,
                                 ccmm_col_steps, ccmm_diag_steps)

RNG = np.random.default_rng(7)
NUM_X, NUM_ROW = 128, 8          # 128 interleaved inputs x 8 tokens = 1024 slots
NUM_INPUTS = 3


@pytest.fixture(scope="module")
def setup():
    ctx = make_context(_test_config())
    assert NUM_X * NUM_ROW == ctx.cfg.slots
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=5)
    steps = sorted(set(ccmm_col_steps(NUM_X, NUM_ROW)
                       + ccmm_diag_steps(NUM_X, NUM_ROW)))
    gks = kg.gen_galois_keys(steps=steps)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)
    return ctx, enc, encryptor, decryptor, ev


def test_pack_roundtrip():
    xs = RNG.uniform(-1, 1, (NUM_INPUTS, NUM_ROW, 12))
    sm = pack_batch(xs, NUM_X, NUM_ROW, NUM_X * NUM_ROW)
    back = unpack_batch(sm, NUM_X, NUM_ROW, NUM_INPUTS)
    assert np.allclose(back, xs)


def test_modmat_exact():
    from moai_tpu.modmat import (mod_matmul, host_weight_digits,
                                 host_bucket_consts)
    from moai_tpu.primes import ntt_primes_near
    qs = ntt_primes_near(29.0, 2 ** 12, 3)
    J, I, N = 37, 5, 64
    x = np.stack([RNG.integers(0, q, size=(J, 2, 1, N), dtype=np.uint32).astype(np.uint32)
                  for q in qs], axis=-2).reshape(J, 2, len(qs), N)
    w = RNG.integers(0, 1 << 30, size=(len(qs), J, I), dtype=np.uint32)
    bm, bo = host_bucket_consts(qs)
    got = mod_matmul(jnp.asarray(x), jnp.asarray(host_weight_digits(w)),
                     jnp.asarray(bm), jnp.asarray(bo),
                     jnp.asarray(np.array(qs, np.uint32)),
                     jnp.asarray(np.array([
                         __import__("moai_tpu.mod_arith", fromlist=["x"]).mont_constants(q)["qneg_inv"]
                         for q in qs], np.uint32)))
    got = np.asarray(got)
    for li, q in enumerate(qs):
        want = (x[:, :, li, :].astype(object)
                * 1)  # [J, 2, N]
        acc = np.zeros((I, 2, N), dtype=object)
        for i in range(I):
            for j in range(J):
                acc[i] += x[j, :, li, :].astype(object) * int(w[li, j, i])
        acc = np.vectorize(lambda v: int(v) % q)(acc).astype(np.uint64)
        assert np.array_equal(got[:, :, li, :].astype(np.uint64), acc), li


def test_cpmm(setup):
    ctx, enc, encryptor, decryptor, ev = setup
    num_col, out_col = 12, 6
    xs = RNG.uniform(-1, 1, (NUM_INPUTS, NUM_ROW, num_col))
    W = RNG.uniform(-1, 1, (num_col, out_col))
    bias = RNG.uniform(-1, 1, out_col)
    ct = batch_input(encryptor, xs, NUM_X, NUM_ROW)
    mm = CPMM(ev, enc, W, n_q=ctx.L, bias=bias)
    import jax
    out = jax.jit(mm)(ct)
    assert out.n_q == ctx.L - 2
    sm = decryptor.decrypt(out).real
    got = unpack_batch(sm, NUM_X, NUM_ROW, NUM_INPUTS)
    want = xs @ W + bias
    err = np.max(np.abs(got - want))
    assert err < 1e-3, err


def test_cpmm_masked(setup):
    ctx, enc, encryptor, decryptor, ev = setup
    num_col, out_col = 10, 4
    lens = [NUM_ROW, 5, 3]
    xs = RNG.uniform(-1, 1, (NUM_INPUTS, NUM_ROW, num_col))
    for j, ln in enumerate(lens):
        xs[j, ln:] = 0.0
    W = RNG.uniform(-1, 1, (num_col, out_col))
    bias = RNG.uniform(-1, 1, out_col)
    mask = bias_vec(lens, NUM_X, NUM_ROW, ctx.cfg.slots)
    ct = batch_input(encryptor, xs, NUM_X, NUM_ROW)
    mm = CPMM(ev, enc, W, n_q=ctx.L, bias=bias, mask=mask)
    import jax
    out = jax.jit(mm)(ct)
    sm = decryptor.decrypt(out).real
    got = unpack_batch(sm, NUM_X, NUM_ROW, NUM_INPUTS)
    want = xs @ W + bias
    for j, ln in enumerate(lens):
        want[j, ln:] = 0.0          # masked rows are zeroed (incl. bias)
    err = np.max(np.abs(got - want))
    assert err < 1e-3, err


def _pack_diag(mats: np.ndarray) -> np.ndarray:
    """[B, m, m] per-input matrices -> [m, slots] diagonal slot matrix:
    diag d slot (NUM_X*k + j) = A_j[k, (k+d) % m]."""
    B, m, _ = mats.shape
    out = np.zeros((m, NUM_X * NUM_ROW))
    for d in range(m):
        for j in range(B):
            k = np.arange(m)
            out[d, NUM_X * k + j] = mats[j, k, (k + d) % m]
    return out


def test_ccmm_col_to_diag(setup):
    import jax
    ctx, enc, encryptor, decryptor, ev = setup
    d = 5
    X = RNG.uniform(-1, 1, (NUM_INPUTS, NUM_ROW, d))
    Wm = RNG.uniform(-1, 1, (NUM_INPUTS, NUM_ROW, d))
    cx = batch_input(encryptor, X, NUM_X, NUM_ROW)
    cw = batch_input(encryptor, Wm, NUM_X, NUM_ROW)
    out = jax.jit(lambda a, b: ccmm_col_to_diag(ev, a, b, NUM_X, NUM_ROW))(cx, cw)
    sm = decryptor.decrypt(out).real            # [NUM_ROW diag cts, slots]
    want = np.einsum("bkd,btd->bkt", X, Wm)     # X W^T per input
    got_diag = _pack_diag(want)
    err = np.max(np.abs(sm - got_diag))
    assert err < 1e-3, err


def test_ccmm_diag_to_col(setup):
    ctx, enc, encryptor, decryptor, ev = setup
    dv = 4
    A = RNG.uniform(-1, 1, (NUM_INPUTS, NUM_ROW, NUM_ROW))
    V = RNG.uniform(-1, 1, (NUM_INPUTS, NUM_ROW, dv))
    diag_slots = _pack_diag(A)
    ca = encryptor.encrypt(encryptor.encode(diag_slots))
    cv = batch_input(encryptor, V, NUM_X, NUM_ROW)
    import jax
    out = jax.jit(lambda a, b: ccmm_diag_to_col(ev, a, b, NUM_X, NUM_ROW))(ca, cv)
    sm = decryptor.decrypt(out).real
    got = unpack_batch(sm, NUM_X, NUM_ROW, NUM_INPUTS)
    want = np.einsum("bkt,btd->bkd", A, V)
    err = np.max(np.abs(got - want))
    assert err < 1e-3, err
