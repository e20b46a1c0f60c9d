"""Multi-chip dryrun at depth: limb-sharded key-switching and a sharded
bootstrap on the virtual 8-device mesh (VERDICT r4 item 8 — the r4
MULTICHIP artifact only sharded a tiny logN=9 attention head).

Two programs, both jitted over a jax.sharding.Mesh(("col", "limb")) with
the library's real shardings (parallel/sharding.py):

1. ``ccmm`` — the double-BSGS QK^T CCMM at the reference's real row count
   (num_row=128, so the real g=12/b=11 BSGS structure and rotation key
   set) with the galois KEYS limb-sharded: every hoisted key-switch MAC
   contracts a [dnum, 2, n_t, N] key tensor whose limb axis lives on the
   mesh, so GSPMD must insert collectives for the base-extension
   broadcast (the multi-chip engineering risk named in SURVEY.md §7.4).
2. ``boot`` — the full ModRaise -> CoeffToSlot -> EvalMod x2 ->
   SlotToCoeff pipeline over a batch of ciphertexts sharded (col, limb),
   with keys and LT plaintexts as sharded jit arguments.

For each program the compiled HLO is scanned for collective ops and the
counts are recorded in MULTICHIP_DEEP.json — the artifact records WHICH
collectives GSPMD chose for the key-switch and LT paths, not just that
the program ran.

Run: python tools/multichip_dryrun.py [--out MULTICHIP_DEEP.json]
(forces JAX_PLATFORMS=cpu with 8 virtual devices; real multi-chip
hardware is unavailable in this environment.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import _env  # noqa: F401,E402

import argparse  # noqa: E402
import json  # noqa: E402
import re  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from moai_tpu.params import CKKSConfig, make_context  # noqa: E402
from moai_tpu.encoder import Encoder  # noqa: E402
from moai_tpu.keys import KeyGenerator, KSwitchKey, GaloisKeys  # noqa: E402
from moai_tpu.encrypt import Encryptor, Decryptor  # noqa: E402
from moai_tpu.evaluator import Evaluator  # noqa: E402
from moai_tpu.ciphertext import Ciphertext  # noqa: E402
from moai_tpu.parallel.sharding import make_mesh, ct_sharding  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def collective_counts(compiled) -> dict:
    txt = compiled.as_text()
    out = {}
    for c in COLLECTIVES:
        n = len(re.findall(rf"\b{c}(?:-start|-done)?\(", txt)) + \
            len(re.findall(rf"\b{c}\b(?=[.\s\"])", txt))
        # HLO names ops like %all-reduce.123 — count op definitions only
        n_def = len(re.findall(rf"= \S+ {c}", txt)) or \
            len(re.findall(rf"{c}\.\d+ =", txt))
        out[c] = n_def if n_def else (1 if c in txt else 0)
    return out


def run_ccmm(mesh) -> dict:
    """Double-BSGS CCMM, num_row=128 (real BSGS structure), keys
    limb-sharded."""
    from moai_tpu.ops.matmul import (ccmm_col_to_diag, ccmm_col_steps)

    num_x, num_row = 8, 128                      # logN=11: 1024 slots
    cfg = CKKSConfig(logN=11, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=4, n_boot_levels=0, dnum=2,
                     hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=7)
    steps = ccmm_col_steps(num_x, num_row)
    gks = kg.gen_galois_keys(steps=steps)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    dec = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)

    # key tensors: [dnum, 2, n_t, N] — limb axis (2) over the mesh
    ksh = NamedSharding(mesh, P(None, None, "limb", None))
    gal_data = {g: jax.device_put(k.data, ksh)
                for g, k in gks.keys.items()}
    relin_data = jax.device_put(ev.relin_key.data, ksh)
    perms = gks.perms
    xsh = ct_sharding(mesh, batched=True, limb=True)

    rng = np.random.default_rng(5)
    C = 16                                       # column (head_dim) axis
    va = rng.normal(0, 0.5, (C, ctx.cfg.slots))
    vb = rng.normal(0, 0.5, (C, ctx.cfg.slots))
    n_q = ctx.L
    a = encryptor.encrypt_values(va, n_q=n_q)
    b = encryptor.encrypt_values(vb, n_q=n_q)

    def f(ad, bd, gal, relin):
        ev.relin_key = KSwitchKey(relin)
        ev.galois_keys = GaloisKeys(
            {g: KSwitchKey(d) for g, d in gal.items()}, perms)
        out = ccmm_col_to_diag(ev, Ciphertext(ad, a.scale, True),
                               Ciphertext(bd, b.scale, True),
                               num_x, num_row)
        return out.data

    jf = jax.jit(f, in_shardings=(xsh, xsh,
                                  {g: ksh for g in gal_data}, ksh),
                 out_shardings=ct_sharding(mesh, batched=True, limb=True))
    t0 = time.perf_counter()
    lowered = jf.lower(a.data, b.data, gal_data, relin_data)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(a.data, b.data, gal_data, relin_data)
    out.block_until_ready()
    run_s = time.perf_counter() - t0

    # numeric check vs the plaintext diagonal-packed product
    got = dec.decrypt(Ciphertext(out, a.scale * b.scale
                                 / ev.level_pair_scale(n_q), True)).real
    A = va.reshape(C, num_row, num_x)
    B = vb.reshape(C, num_row, num_x)
    # out[d] slot (k, j) = sum_c A[c, k, j] * B[c, (k+d) % num_row, j]
    want = np.zeros((num_row, num_row, num_x))
    for d in range(num_row):
        for k in range(num_row):
            want[d, k] = np.einsum("cj,cj->j", A[:, k],
                                   B[:, (k + d) % num_row])
    err = float(np.abs(got.reshape(num_row, num_row, num_x)
                       - want).max())
    return {"name": "ccmm_col_to_diag_num_row128_limb_sharded_keys",
            "logN": cfg.logN, "num_row": num_row, "galois_keys": len(steps),
            "compile_s": round(compile_s, 1), "run_s": round(run_s, 2),
            "max_err": err, "ok": bool(err < 1e-2),
            "collectives": collective_counts(compiled)}


def run_boot(mesh) -> dict:
    """Full bootstrap pipeline, ct batch sharded (col, limb), keys + LT
    plaintexts sharded jit arguments."""
    from moai_tpu.boot.bootstrap import Bootstrapper

    cfg = CKKSConfig(logN=10, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=18, n_boot_levels=0, dnum=3,
                     special_bits=29.5, hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=9)
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    dec = Decryptor(ctx, enc, kg.sk)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key())
    bt = Bootstrapper(ev, enc, lt_group=3)
    ev.galois_keys = kg.gen_galois_keys(steps=bt.galois_steps(),
                                        conjugate=True)
    perms = ev.galois_keys.perms

    ksh = NamedSharding(mesh, P(None, None, "limb", None))
    gal_data = {g: jax.device_put(k.data, ksh)
                for g, k in ev.galois_keys.keys.items()}
    relin_data = jax.device_put(ev.relin_key.data, ksh)
    ptsh = NamedSharding(mesh, P(None, "limb", None))

    rng = np.random.default_rng(2)
    batch = 8
    v = rng.uniform(-0.8, 0.8, (batch, ctx.cfg.slots))
    ct = encryptor.encrypt(encryptor.encode(v, n_q=ctx.n_q0))
    lt = [jax.device_put(p, ptsh) for p in bt.collect_lt(ct.scale)]
    xsh = ct_sharding(mesh, batched=True, limb=True)

    def f(d, lt_, gal, relin):
        ev.relin_key = KSwitchKey(relin)
        ev.galois_keys = GaloisKeys(
            {g: KSwitchKey(k) for g, k in gal.items()}, perms)
        return bt(Ciphertext(d, ct.scale, True), lt=lt_).data

    jf = jax.jit(f, in_shardings=(xsh, [ptsh] * len(lt),
                                  {g: ksh for g in gal_data}, ksh),
                 out_shardings=xsh)
    t0 = time.perf_counter()
    compiled = jf.lower(ct.data, lt, gal_data, relin_data).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(ct.data, lt, gal_data, relin_data)
    out.block_until_ready()
    run_s = time.perf_counter() - t0
    got = dec.decrypt(Ciphertext(out, ctx.scale, True)).real
    err = float(np.abs(got - v).max())
    return {"name": "bootstrap_batch8_col_limb_sharded",
            "logN": cfg.logN, "slots": ctx.cfg.slots, "batch": batch,
            "boot_levels": bt.levels, "lt_plaintexts": len(lt),
            "compile_s": round(compile_s, 1), "run_s": round(run_s, 2),
            "max_err": err, "ok": bool(err < 2e-2),
            "collectives": collective_counts(compiled)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTICHIP_DEEP.json")
    ap.add_argument("--only", choices=["ccmm", "boot"], default=None)
    args = ap.parse_args()
    mesh = make_mesh(8, limb_axis=2)
    res = {"mesh": "8 virtual CPU devices, axes (col=4, limb=2)",
           "programs": []}
    if args.only in (None, "ccmm"):
        r = run_ccmm(mesh)
        print(json.dumps(r), flush=True)
        res["programs"].append(r)
    if args.only in (None, "boot"):
        r = run_boot(mesh)
        print(json.dumps(r), flush=True)
        res["programs"].append(r)
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(f"[multichip] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
