"""Versioned serialization for configs, keys, ciphertexts and plaintexts.

TPU-native counterpart of SEAL's serialization layer (reference:
thirdparty/SEAL-4.1-bs/native/src/seal/serialization.{h,cpp} +
util/ztools.cpp — versioned headers, zlib/zstd-compressed streams, and
save/load members on every container).  Here one `.npz` (numpy zip,
zlib-compressed) holds the arrays, with a JSON header for metadata:

- the header carries a format version and the full CKKSConfig, so a load
  into a fresh process can rebuild the exact Context (SEAL pins
  parms_id the same way);
- ciphertexts/plaintexts store their uint32 RNS data plus scale/is_ntt;
- key material (secret/public/relin/galois) round-trips for
  client/server separation: the server loads evaluation keys only.
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile

import numpy as np
import jax.numpy as jnp

from .params import CKKSConfig, Context, make_context
from .ciphertext import Ciphertext, Plaintext
from .keys import SecretKey, PublicKey, KSwitchKey, GaloisKeys

FORMAT_VERSION = 1


def _cfg_dict(cfg: CKKSConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["q0_bits"] = list(d["q0_bits"])
    return d


def _cfg_from_dict(d: dict) -> CKKSConfig:
    d = dict(d)
    d["q0_bits"] = tuple(d["q0_bits"])
    return CKKSConfig(**d)


def _save(path: str, header: dict, arrays: dict):
    header = dict(header)
    header["format_version"] = FORMAT_VERSION
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("header.json", json.dumps(header))
        for name, arr in arrays.items():
            buf = io.BytesIO()
            np.save(buf, np.asarray(arr))
            z.writestr(name + ".npy", buf.getvalue())


def _load(path: str):
    with zipfile.ZipFile(path, "r") as z:
        header = json.loads(z.read("header.json"))
        if header["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"file format {header['format_version']} is newer than "
                f"supported {FORMAT_VERSION}")
        arrays = {}
        for name in z.namelist():
            if name.endswith(".npy"):
                arrays[name[:-4]] = np.load(io.BytesIO(z.read(name)))
    return header, arrays


# -- context ----------------------------------------------------------------

def save_config(path: str, cfg: CKKSConfig):
    _save(path, {"kind": "config", "config": _cfg_dict(cfg)}, {})


def load_context(path: str) -> Context:
    header, _ = _load(path)
    return make_context(_cfg_from_dict(header["config"]))


# -- ciphertext / plaintext ---------------------------------------------------

def save_ciphertext(path: str, ct: Ciphertext, cfg: CKKSConfig | None = None):
    h = {"kind": "ciphertext", "scale": ct.scale, "is_ntt": ct.is_ntt}
    if cfg is not None:
        h["config"] = _cfg_dict(cfg)
    _save(path, h, {"data": ct.data})


def load_ciphertext(path: str) -> Ciphertext:
    h, arrays = _load(path)
    assert h["kind"] == "ciphertext", h["kind"]
    return Ciphertext(jnp.asarray(arrays["data"]), float(h["scale"]),
                      bool(h["is_ntt"]))


def save_plaintext(path: str, pt: Plaintext):
    _save(path, {"kind": "plaintext", "scale": pt.scale,
                 "is_ntt": pt.is_ntt}, {"data": pt.data})


def load_plaintext(path: str) -> Plaintext:
    h, arrays = _load(path)
    assert h["kind"] == "plaintext", h["kind"]
    return Plaintext(jnp.asarray(arrays["data"]), float(h["scale"]),
                     bool(h["is_ntt"]))


# -- keys ---------------------------------------------------------------------

def save_secret_key(path: str, sk: SecretKey):
    _save(path, {"kind": "secret_key"},
          {"coeffs": sk.coeffs, "s_ntt": sk.s_ntt})


def load_secret_key(path: str) -> SecretKey:
    h, a = _load(path)
    assert h["kind"] == "secret_key"
    return SecretKey(a["coeffs"], jnp.asarray(a["s_ntt"]))


def save_public_key(path: str, pk: PublicKey):
    _save(path, {"kind": "public_key"}, {"data": pk.data})


def load_public_key(path: str) -> PublicKey:
    h, a = _load(path)
    assert h["kind"] == "public_key"
    return PublicKey(jnp.asarray(a["data"]))


def save_kswitch_key(path: str, key: KSwitchKey):
    _save(path, {"kind": "kswitch_key"}, {"data": key.data})


def load_kswitch_key(path: str) -> KSwitchKey:
    h, a = _load(path)
    assert h["kind"] == "kswitch_key"
    return KSwitchKey(jnp.asarray(a["data"]))


def save_galois_keys(path: str, gks: GaloisKeys):
    elts = sorted(gks.keys.keys())
    arrays = {}
    for g in elts:
        arrays[f"key_{g}"] = gks.keys[g].data
        arrays[f"perm_{g}"] = gks.perms[g]
    _save(path, {"kind": "galois_keys", "elts": elts}, arrays)


def load_galois_keys(path: str) -> GaloisKeys:
    h, a = _load(path)
    assert h["kind"] == "galois_keys"
    keys, perms = {}, {}
    for g in h["elts"]:
        keys[g] = KSwitchKey(jnp.asarray(a[f"key_{g}"]))
        perms[g] = a[f"perm_{g}"]
    return GaloisKeys(keys, perms)


# -- checkpoint / resume ------------------------------------------------------

def save_layer_state(path: str, ct: Ciphertext, layer_idx: int,
                     cfg: CKKSConfig | None = None):
    """Checkpoint a model's inter-layer ciphertext: the output of
    ``layers[layer_idx]``, ready to enter ``layers[layer_idx + 1]``.

    The reference checkpoints by DECRYPTING each layer's output to
    layer_N.txt and re-reading it with read_input_2
    (test_full_scheme.hpp:69-92, 497-520); here the checkpoint is the
    ciphertext itself — resumable without the secret key."""
    h = {"kind": "layer_state", "layer_idx": int(layer_idx),
         "scale": ct.scale, "is_ntt": ct.is_ntt}
    if cfg is not None:
        h["config"] = _cfg_dict(cfg)
    _save(path, h, {"data": ct.data})


def load_layer_state(path: str) -> tuple[Ciphertext, int]:
    """-> (ciphertext, layer_idx).  Feed to
    EncryptedBertModel(..., start_layer=layer_idx + 1)."""
    h, arrays = _load(path)
    assert h["kind"] == "layer_state", h["kind"]
    ct = Ciphertext(jnp.asarray(arrays["data"]), float(h["scale"]),
                    bool(h["is_ntt"]))
    return ct, int(h["layer_idx"])
