"""Aggregate a profile_train.py op dump into a subsystem budget table.

Reads the JSONL op rows (from profile_train.py --parse-only --top N) for the
"XLA Ops" line and buckets self-times by subsystem using the op name / output
type / operand shapes. Prints a per-step table (the dump covers --steps
steps; pass --steps to divide).

Usage: python tools/aggregate_prof.py /tmp/prof_full.log [--steps 2]
"""

import argparse
import json
import re
import sys
from collections import defaultdict


def bucket(op: str) -> str:
    own = op.split(" = ")[0].lstrip("%")
    if own.startswith(("conv1", "conv2")) and "custom-call" in op:
        return "pallas merged conv (fwd/dx/dW)"
    if "custom-call" in op:
        return "other custom-call"
    if own.startswith(("copy", "bitcast")):
        return "layout copies"
    if own.startswith("pad"):
        return "pads (halo materialization)"
    if own.startswith("reshape") or own.startswith("transpose"):
        return "reshape/transpose"
    if own.startswith("convolution") or own.startswith("conv"):
        return "xla convs (resample/deep)"
    if own.startswith("dynamic-update-slice") or own.startswith("dynamic-slice"):
        return "dynamic slices"
    if "fusion" in own:
        # classify fusions by output signature
        if re.search(r"f32\[5,[35],[35],\d+,\d+\]", op) or re.search(
            r"f32\[[35],[35],[35],\d+,\d+\]", op
        ):
            return "optimizer/expert-grad fusions (kernel-shaped f32)"
        if re.search(r"f32\[\d+\]\{0", op):
            return "BN stats/apply fusions (channel vectors)"
        if re.search(r"\(f32\[\d+\]", op):
            return "BN stats/apply fusions (channel vectors)"
        return "activation fusions (combine/bn-apply/tap-sum/s2d)"
    return "misc"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    rows = []
    in_xla_ops = False
    for line in open(args.log):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "line" in d:
            in_xla_ops = d.get("line") == "XLA Ops"
            if in_xla_ops:
                total = d["events_ms_total"]
        elif "op" in d and in_xla_ops:
            rows.append(d)

    agg = defaultdict(float)
    cnt = defaultdict(int)
    for r in rows:
        b = bucket(r["op"])
        agg[b] += r["ms"]
        cnt[b] += r["n"]
    listed = sum(agg.values())
    print(f"{'bucket':55s} {'ms/step':>8s} {'ops':>5s}")
    for b, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{b:55s} {ms / args.steps:8.1f} {cnt[b] // args.steps:5d}")
    print(f"{'(listed rows)':55s} {listed / args.steps:8.1f}")
    print(f"{'(line total incl. unlisted tail)':55s} {total / args.steps:8.1f}")


if __name__ == "__main__":
    main()
