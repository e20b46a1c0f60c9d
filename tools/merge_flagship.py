"""Merge a flagship stage-subset run's JSON (stdin or --in file) into
FLAGSHIP.json: updates stages_s/stage_notes for the stages present,
recomputes stage_sum/amortized/vs_ref, and drops satisfied
missing_stages entries.

Usage: python tools/flagship.py --preset n15 --stages av_ccmm | tail -1 \
       | python tools/merge_flagship.py
"""

import argparse
import json
import sys

REF_PER_LAYER_S = {          # paper Table 3, s/input (tools/flagship.py)
    "qkv_cpmm": 37.4 / 12, "qkt_ccmm": 40.3 / 12, "softmax": 53.3 / 12,
    "av_ccmm": 1.4 / 12, "self_output_cpmm": 1.7 / 12,
    "layernorm_x2": 1.2 / 12, "ffn_gelu_ffn": (44.1 + 3.3 + 7.1) / 12,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", default=None)
    ap.add_argument("--flagship", default="FLAGSHIP.json")
    ap.add_argument("--note", default=None,
                    help="append to method_note")
    args = ap.parse_args()
    src = open(args.inp).read() if args.inp else sys.stdin.read()
    line = [l for l in src.strip().splitlines() if l.startswith("{")][-1]
    run = json.loads(line)
    flag = json.load(open(args.flagship))
    assert run["preset"] == flag["preset"] and run["N"] == flag["N"], \
        (run.get("preset"), flag.get("preset"))
    flag["stages_s"].update(run["stages_s"])
    notes = flag.setdefault("stage_notes", {})
    for k in run["stages_s"]:
        notes[k] = run.get("stage_notes", {}).get(k, notes.get(k, ""))
    total = sum(flag["stages_s"].values())
    flag["stage_sum_s"] = round(total, 3)
    flag["amortized_s_per_input"] = round(total / flag["num_inputs"], 4)
    flag["vs_ref_stages"] = {
        k: round(REF_PER_LAYER_S[k] / (v / flag["num_inputs"]), 2)
        for k, v in flag["stages_s"].items()
        if k in REF_PER_LAYER_S and v > 0}
    flag["missing_stages"] = [s for s in flag.get("missing_stages", [])
                              if s not in run["stages_s"]]
    if args.note:
        flag["method_note"] = flag.get("method_note", "") + " | " + args.note
    json.dump(flag, open(args.flagship, "w"), indent=1)
    print(json.dumps({"merged": sorted(run["stages_s"]),
                      "stage_sum_s": flag["stage_sum_s"],
                      "missing_stages": flag["missing_stages"]}))


if __name__ == "__main__":
    main()
