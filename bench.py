"""Benchmark: CKKS ciphertext mult+relin+rescale+rotation throughput.

BASELINE.json config 1: the hot evaluator composite (ct*ct multiply ->
relinearize -> rescale -> rotate) at N=2^15, batched over a ciphertext
column axis — the unit the whole encrypted-BERT runtime is built from
(the reference's per-op CPU costs: mult+relin ~6ms, rotation ~6ms at
N=2^15 on one Xeon 8480+ core; see BASELINE.md / paper Table 3 scaling).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` divides by an 80 ops/s single-thread SEAL-4.1 estimate
for the same composite at N=2^15 (mult+relin+rescale+rotate ~12.5ms).
"""

import json
import time

import numpy as np

BASELINE_OPS_S = 80.0      # SEAL-4.1 1-thread estimate, N=2^15 (see module doc)
BATCH = 32                 # ciphertext columns per launch
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from moai_tpu.params import bench_config_n15, make_context
    from moai_tpu.encoder import Encoder
    from moai_tpu.keys import KeyGenerator
    from moai_tpu.encrypt import Encryptor
    from moai_tpu.evaluator import Evaluator
    from moai_tpu.ciphertext import Ciphertext

    ctx = make_context(bench_config_n15())
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
        out = ev.rotate(out, 1)
        return out.data

    fn = jax.jit(step)
    out = fn(a.data, b.data)
    out.block_until_ready()                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(a.data, b.data)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    ops_s = BATCH / dt
    print(json.dumps({
        "metric": "ckks_mult_relin_rescale_rotate_n15",
        "value": round(ops_s, 2),
        "unit": "ciphertext_ops/s",
        "vs_baseline": round(ops_s / BASELINE_OPS_S, 3),
    }))


if __name__ == "__main__":
    main()
