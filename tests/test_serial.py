"""Serialization round-trips (reference: SEAL serialization.{h,cpp} +
save/load members on every container; util/ztools.cpp compression)."""

import numpy as np

from moai_tpu.params import CKKSConfig, make_context
from moai_tpu.encoder import Encoder
from moai_tpu.keys import KeyGenerator
from moai_tpu.encrypt import Encryptor, Decryptor
from moai_tpu import serial

CFG = CKKSConfig(logN=9, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                 n_data_levels=4, n_boot_levels=0, dnum=2, hamming_weight=32)


def test_roundtrips(tmp_path):
    ctx = make_context(CFG)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=9)
    pk = kg.gen_public_key()
    rk = kg.gen_relin_key()
    gks = kg.gen_galois_keys(steps=[1, -2], conjugate=True)
    encryptor = Encryptor(ctx, enc, pk, kg)

    # config -> context
    p = tmp_path / "cfg.bin"
    serial.save_config(str(p), CFG)
    ctx2 = serial.load_context(str(p))
    assert ctx2.q_primes == ctx.q_primes

    # ciphertext
    vals = np.random.default_rng(1).uniform(-1, 1, ctx.cfg.slots)
    ct = encryptor.encrypt(encryptor.encode(vals[None]))
    p = tmp_path / "ct.bin"
    serial.save_ciphertext(str(p), ct, CFG)
    ct2 = serial.load_ciphertext(str(p))
    assert ct2.scale == ct.scale and ct2.is_ntt == ct.is_ntt
    assert np.array_equal(np.asarray(ct2.data), np.asarray(ct.data))

    # decrypt with a reloaded secret key
    p = tmp_path / "sk.bin"
    serial.save_secret_key(str(p), kg.sk)
    sk2 = serial.load_secret_key(str(p))
    dec = Decryptor(ctx, enc, sk2)
    got = dec.decrypt(ct2).real[0]
    assert np.abs(got - vals).max() < 1e-4

    # eval keys
    p = tmp_path / "pk.bin"
    serial.save_public_key(str(p), pk)
    assert np.array_equal(np.asarray(serial.load_public_key(str(p)).data),
                          np.asarray(pk.data))
    p = tmp_path / "rk.bin"
    serial.save_kswitch_key(str(p), rk)
    assert np.array_equal(np.asarray(serial.load_kswitch_key(str(p)).data),
                          np.asarray(rk.data))
    p = tmp_path / "gk.bin"
    serial.save_galois_keys(str(p), gks)
    gks2 = serial.load_galois_keys(str(p))
    assert set(gks2.keys) == set(gks.keys)
    for g in gks.keys:
        assert np.array_equal(np.asarray(gks2.keys[g].data),
                              np.asarray(gks.keys[g].data))
        assert np.array_equal(gks2.perms[g], gks.perms[g])


def test_layer_state_resume_roundtrip(tmp_path):
    """Checkpoint/resume plumbing (reference read_input_2 analog,
    test_full_scheme.hpp:69-92): layer-state round-trips bit-exactly and
    EncryptedBertModel(start_layer=k) runs exactly layers[k:]."""
    import jax.numpy as jnp
    from moai_tpu.ciphertext import Ciphertext
    from moai_tpu.params import test_config
    from moai_tpu.serial import save_layer_state, load_layer_state
    from moai_tpu.models.bert import EncryptedBertModel

    rng = np.random.default_rng(8)
    data = rng.integers(0, 1 << 30, size=(3, 2, 4, 64)).astype(np.uint32)
    ct = Ciphertext(jnp.asarray(data), 2.0 ** 52, True)
    p = tmp_path / "layer3.npz"
    save_layer_state(str(p), ct, layer_idx=3, cfg=test_config())
    ct2, idx = load_layer_state(str(p))
    assert idx == 3 and ct2.scale == ct.scale and ct2.is_ntt
    assert np.array_equal(np.asarray(ct2.data), data)

    # start_layer semantics without building a real model: stub layers
    ran = []
    model = EncryptedBertModel.__new__(EncryptedBertModel)
    model.layers = [
        (lambda i: (lambda c: (ran.append(i), c)[1]))(i) for i in range(5)]
    model.on_layer = None
    model(ct2, start_layer=idx + 1)
    assert ran == [4]
