"""End-to-end Table-3 projection: FLAGSHIP.json + BOOT_BENCH.json ->
amortized seconds per input for the full 12-layer encrypted BERT, vs the
reference's 574.6 s (BASELINE.md; paper Table 3).

Composition per layer (reference: test_full_scheme.hpp:484-1120):
  stage_sum (all non-boot stages, measured at real dims by flagship) +
  4 x 768-ciphertext bootstraps (bench_boot boot_s_per_ct at the same
  slot count, x 768 x 4).
Amortized per input: / num_inputs; x 12 layers for the model.

The softmax-internal bootstrap (1 sum ciphertext per head per layer,
softmax.hpp:529-536) adds 12 more single-ct bootstraps per layer —
included.  Honest caveats are emitted in the JSON.

Usage: python tools/project_e2e.py [--flagship FLAGSHIP.json]
       [--boot BOOT_BENCH.json] [--out E2E_PROJECTION.json]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

REF_TOTAL_S_PER_INPUT = 574.6      # paper Table 3, amortized over 256 inputs
N_LAYERS = 12
BOOTS_PER_LAYER = 4                # reference: 4 x 768-ct bootstraps/layer
CTS_PER_BOOT = 768
SOFTMAX_BOOTS_PER_LAYER = 12       # 1 sum ct per head (softmax.hpp:529)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", default="FLAGSHIP.json")
    ap.add_argument("--boot", default="BOOT_BENCH.json")
    ap.add_argument("--out", default="E2E_PROJECTION.json")
    args = ap.parse_args()

    flag = json.load(open(args.flagship))
    boots = json.load(open(args.boot))
    if isinstance(boots, dict):
        boots = [boots]
    # prefer the boot measurement at the flagship's slot count
    want_slots = flag["N"] // 2
    boot = min(boots, key=lambda b: abs(b["slots"] - want_slots))

    n_inputs = flag["num_inputs"]
    stage_sum = flag["stage_sum_s"]
    per_ct = boot["boot_s_per_ct"]
    # Honesty gates (ADVICE r4): a projection from an incomplete stage
    # table, or from a boot row at the wrong slot count / backend, would
    # overstate the speedup with no visible caveat.  Refuse the speedup
    # (emit nulls + the reason) instead.
    problems = []
    if flag.get("missing_stages"):
        problems.append("FLAGSHIP.json missing stages: "
                        + ", ".join(flag["missing_stages"]))
    if boot["slots"] != want_slots:
        problems.append(
            f"no boot measurement at the flagship slot count "
            f"({want_slots}); nearest is {boot['slots']} slots")
    if boot.get("backend", "tpu") != flag.get("backend", "tpu"):
        problems.append(
            f"boot row backend {boot.get('backend')!r} != flagship "
            f"backend {flag.get('backend', 'tpu')!r}")
    boot_layer_s = (BOOTS_PER_LAYER * CTS_PER_BOOT
                    + SOFTMAX_BOOTS_PER_LAYER) * per_ct
    layer_s = stage_sum + boot_layer_s
    per_input = layer_s / n_inputs
    model_s = per_input * N_LAYERS

    out = {
        "flagship_preset": flag["preset"],
        "N": flag["N"],
        "num_inputs": n_inputs,
        "stage_sum_s_per_layer": round(stage_sum, 2),
        "boot_s_per_ct": per_ct,
        "boot_slots": boot["slots"],
        "boot_max_err": boot.get("max_err"),
        "boot_s_per_layer_batch": round(boot_layer_s, 2),
        "layer_s_batch": round(layer_s, 2),
        "amortized_s_per_input_12layer":
            None if problems else round(model_s, 2),
        "ref_s_per_input_12layer": REF_TOTAL_S_PER_INPUT,
        "speedup_vs_ref":
            None if problems else round(REF_TOTAL_S_PER_INPUT / model_s, 2),
        "refused_because": problems or None,
        "caveats": [
            "stage times measured on one TPU v5e chip at N=2^{}, {} "
            "interleaved inputs (reference: N=2^16, 256 inputs on a "
            "56-core Xeon 8480+)".format(
                flag["N"].bit_length() - 1, n_inputs),
            "bootstrap cost extrapolated linearly from a batch-{} "
            "measurement at the same slot count".format(boot["batch"]),
            "per-layer stage sum uses synthetic uniform-residue inputs "
            "(all kernels data-oblivious); numerics anchored separately "
            "by tests/test_golden.py",
        ],
    }
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
