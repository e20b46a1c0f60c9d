"""Multi-device scaling sweep: bench composite ops/s at 1/2/4/8 devices.

BASELINE.json's scaling metric (ops/s at 1 chip / 1 host / >=2 hosts)
measured on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count; on real multi-chip hardware the same script measures real
scaling — sharding code is identical, XLA inserts the collectives).

Two shardings, matching SURVEY.md §2.4's two parallel axes:
- col:  ciphertext-column batch axis sharded (the OpenMP analog) —
  embarrassingly parallel, expected ~linear.
- limb: RNS limb axis sharded — dyadic ops limb-local; keyswitch
  base-extension broadcasts across limbs (all-gather over the mesh).

Writes SCALING.json at the repo root and prints it.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import _env  # noqa: F401,E402  (repo path + compile cache)


import json
import os
import sys
import time

os.environ.setdefault("SWEEP_DEVICES", "8")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count="
                           f"{os.environ['SWEEP_DEVICES']}")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from moai_tpu.params import CKKSConfig, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator
    from moai_tpu.encrypt import Encryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ciphertext import Ciphertext
    from moai_tpu.parallel.sharding import make_mesh

    BATCH = 16
    cfg = CKKSConfig(logN=13, q0_bits=(30.0, 30.0), data_pair_bits=26.0,
                     n_data_levels=7, n_boot_levels=0, dnum=2,
                     hamming_weight=64)
    ctx = make_context(cfg)
    enc = Encoder(ctx)
    kg = KeyGenerator(ctx, seed=3)
    gks = kg.gen_galois_keys(steps=[1])
    encryptor = Encryptor(ctx, enc, kg.gen_public_key(), kg)
    ev = Evaluator(ctx, relin_key=kg.gen_relin_key(), galois_keys=gks)

    rng = np.random.default_rng(0)
    vals = rng.uniform(-1, 1, (BATCH, ctx.cfg.slots))
    a = encryptor.encrypt(encryptor.encode(vals))
    b = encryptor.encrypt(encryptor.encode(vals[::-1]))

    def step(ad, bd):
        ca = Ciphertext(ad, ctx.scale, True)
        cb = Ciphertext(bd, ctx.scale, True)
        out = ev.rescale_pair(ev.relinearize(ev.multiply(ca, cb)))
        return ev.rotate(out, 1).data

    results = {}
    n_all = len(jax.devices())
    for n_dev in [1, 2, 4, 8]:
        if n_dev > n_all:
            break
        for mode in (["col"] if n_dev == 1 else ["col", "limb"]):
            mesh = make_mesh(n_dev, limb_axis=n_dev if mode == "limb"
                             else 1)
            if mode == "col":
                spec = P("col", None, None, None)
            else:
                spec = P(None, None, "limb", None)
            sh = NamedSharding(mesh, spec)
            ad = jax.device_put(a.data, sh)
            bd = jax.device_put(b.data, sh)
            # no out_shardings constraint: rescale drops limbs, so the
            # output limb count need not divide the mesh axis
            fn = jax.jit(step, in_shardings=(sh, sh))
            out = fn(ad, bd)
            out.block_until_ready()
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = fn(ad, bd)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            key = f"{n_dev}dev_{mode}"
            results[key] = round(BATCH / dt, 2)
            print(f"[sweep] {key:<12} {BATCH / dt:8.2f} ops/s "
                  f"({dt * 1e3:.1f} ms)", file=sys.stderr)

    base = results.get("1dev_col", 1.0)
    eff = {k: round(v / base / int(k.split("dev")[0]), 3)
           for k, v in results.items()}
    out = {"metric": "ckks_composite_ops_s", "N": ctx.cfg.N,
           "batch": BATCH, "results": results,
           "scaling_efficiency_vs_1dev": eff,
           "physical_cores": os.cpu_count(),
           "note": "virtual CPU mesh (xla_force_host_platform_device_"
                   "count); col = ciphertext-column sharding, limb = "
                   "RNS-limb sharding.  Virtual devices TIME-SHARE the "
                   "physical cores, so ops/s here validates sharded "
                   "execution + collective insertion, not speedup; on "
                   "real multi-chip hardware the same code measures true "
                   "scaling."}
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
