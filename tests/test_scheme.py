"""Scheme-level tests: encode/encrypt/decrypt roundtrip and evaluator ops.

Oracle strategy follows SEAL's evaluator tests (reference:
thirdparty/SEAL-4.1-bs/native/tests/seal/evaluator.cpp): encrypted op then
decrypt and compare against the plaintext computation within noise bounds.
"""

import numpy as np
import pytest

from moai_tpu.params import test_config as _test_config, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu.evaluator import Evaluator

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def setup():
    ctx = make_context(_test_config())
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=123)
    pk = kg.gen_public_key()
    rlk = kg.gen_relin_key()
    gks = kg.gen_galois_keys(steps=[1, 2, 4, -1], conjugate=True)
    encryptor = Encryptor(ctx, enc, pk, kg)
    decryptor = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=rlk, galois_keys=gks)
    return ctx, enc, kg, encryptor, decryptor, ev


def rand_vals(ctx, lo=-1.0, hi=1.0):
    return RNG.uniform(lo, hi, ctx.cfg.slots)


def test_encode_decode(setup):
    ctx, enc, *_ = setup
    v = rand_vals(ctx)
    res = enc.encode(v)
    back = enc.decode(res, ctx.scale)
    assert np.max(np.abs(back.real - v)) < 1e-7
    assert np.max(np.abs(back.imag)) < 1e-7


def test_encrypt_decrypt_roundtrip(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    v = rand_vals(ctx)
    ct = encryptor.encrypt_values(v)
    out = decryptor.decrypt(ct)
    assert np.max(np.abs(out.real - v)) < 1e-6


def test_add_sub_plain_and_ct(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    a = rand_vals(ctx)
    b = rand_vals(ctx)
    ca, cb = encryptor.encrypt_values(a), encryptor.encrypt_values(b)
    assert np.max(np.abs(decryptor.decrypt(ev.add(ca, cb)).real - (a + b))) < 1e-5
    assert np.max(np.abs(decryptor.decrypt(ev.sub(ca, cb)).real - (a - b))) < 1e-5
    pb = encryptor.encode(b)
    assert np.max(np.abs(decryptor.decrypt(ev.add_plain(ca, pb)).real - (a + b))) < 1e-5
    assert np.max(np.abs(decryptor.decrypt(ev.add_const(ca, 0.5)).real - (a + 0.5))) < 1e-5


def test_multiply_plain_rescale(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    a = rand_vals(ctx)
    w = rand_vals(ctx)
    ca = encryptor.encrypt_values(a)
    pw = encryptor.encode(w)
    prod = ev.rescale_pair(ev.multiply_plain(ca, pw))
    assert prod.n_q == ctx.L - 2
    out = decryptor.decrypt(prod)
    assert np.max(np.abs(out.real - a * w)) < 1e-4, np.max(np.abs(out.real - a * w))


def test_multiply_relin_rescale(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    a = rand_vals(ctx)
    b = rand_vals(ctx)
    ca, cb = encryptor.encrypt_values(a), encryptor.encrypt_values(b)
    prod = ev.rescale_pair(ev.multiply_relin(ca, cb))
    out = decryptor.decrypt(prod)
    err = np.max(np.abs(out.real - a * b))
    assert err < 1e-4, err


def test_square_and_depth(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    a = rand_vals(ctx, -0.9, 0.9)
    ct = encryptor.encrypt_values(a)
    want = a
    for _ in range(2):          # two sequential squarings (depth 2 of 3)
        ct = ev.rescale_pair(ev.relinearize(ev.square(ct)))
        want = want * want
    out = decryptor.decrypt(ct)
    err = np.max(np.abs(out.real - want))
    assert err < 1e-3, err


def test_mul_const(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    a = rand_vals(ctx)
    ct = ev.rescale_pair(ev.mul_const(encryptor.encrypt_values(a), 3.25))
    out = decryptor.decrypt(ct)
    assert np.max(np.abs(out.real - 3.25 * a)) < 1e-4


def test_rotation(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    a = rand_vals(ctx)
    ct = encryptor.encrypt_values(a)
    for steps in (1, 2, 4):
        out = decryptor.decrypt(ev.rotate(ct, steps))
        want = np.roll(a, -steps)
        err = np.max(np.abs(out.real - want))
        assert err < 1e-4, (steps, err)
    # composed rotation via power-of-two fallback (no direct key for 3)
    out = decryptor.decrypt(ev.rotate(ct, 3))
    assert np.max(np.abs(out.real - np.roll(a, -3))) < 1e-4
    # negative step with its own key
    out = decryptor.decrypt(ev.rotate(ct, -1))
    assert np.max(np.abs(out.real - np.roll(a, 1))) < 1e-4


def test_conjugate(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    v = rand_vals(ctx) + 1j * rand_vals(ctx)
    ct = encryptor.encrypt_values(v)
    out = decryptor.decrypt(ev.conjugate(ct))
    assert np.max(np.abs(out - np.conj(v))) < 1e-4


def test_mod_drop(setup):
    ctx, enc, kg, encryptor, decryptor, ev = setup
    a = rand_vals(ctx)
    ct = ev.mod_drop_level(encryptor.encrypt_values(a), 1)
    assert ct.n_q == ctx.L - 2
    assert np.max(np.abs(decryptor.decrypt(ct).real - a)) < 1e-6


def test_batched_ciphertexts(setup):
    """Leading batch axes must broadcast through every op (the TPU-native
    replacement for the reference's vector<Ciphertext> OpenMP loops)."""
    ctx, enc, kg, encryptor, decryptor, ev = setup
    import jax.numpy as jnp
    a = RNG.uniform(-1, 1, (3, ctx.cfg.slots))
    cts = [encryptor.encrypt_values(a[i]) for i in range(3)]
    batched = cts[0].with_data(jnp.stack([c.data for c in cts]))
    w = rand_vals(ctx)
    pw = encryptor.encode(w)
    prod = ev.rescale_pair(ev.multiply_plain(batched, pw))
    for i in range(3):
        one = prod.with_data(prod.data[i])
        out = decryptor.decrypt(one)
        assert np.max(np.abs(out.real - a[i] * w)) < 1e-4


def test_sliced_keys(setup):
    """Keys restricted to a stage level (keys.slice_kswitch/slice_galois)
    produce bit-identical results to full keys at that level — the
    flagship driver's per-stage key residency relies on this."""
    from moai_tpu.keys import slice_kswitch, slice_galois
    from moai_tpu.evaluator import Evaluator
    import jax.numpy as jnp
    ctx, enc, kg, encryptor, decryptor, ev = setup
    n_q = ctx.L - 2
    v = rand_vals(ctx)
    ct = encryptor.encrypt_values(v)
    ct = ev.mod_drop_to(ct, n_q)
    full_rot = ev.rotate(ct, 1)
    full_sq = ev.square_rescale(ct)
    ev2 = Evaluator(ctx,
                    relin_key=slice_kswitch(ev.relin_key, n_q, ctx.L),
                    galois_keys=slice_galois(ev.galois_keys, n_q, ctx.L))
    assert ev2.relin_key.data.shape[-2] == n_q + ctx.K
    got_rot = ev2.rotate(ct, 1)
    got_sq = ev2.square_rescale(ct)
    assert jnp.array_equal(full_rot.data, got_rot.data)
    assert jnp.array_equal(full_sq.data, got_sq.data)
