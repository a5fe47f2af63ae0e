#!/usr/bin/env python3
"""Merge per-SF isolated bench artifacts into the two-decade scale table.

Usage:
  python3 tools/scalecurve.py sf0.1=/tmp/bench_curve_sf0.1.json \
      sf1=/tmp/bench_curve_sf1.json sf10=/tmp/bench_curve_sf10.json

Each file is a Bench --isolated artifact (``{"isolated": {name:
{"median": s, ...}}}`` — SPARK_GRAFT_BENCH_OUT points Bench at it).
Prints a markdown table of per-query medians with decade-over-decade
ratios, plus a JSON line for machine diffing. A ratio is data-growth
wall-clock growth: 10x data at ratio <= ~3 is sub-linear-to-linear,
~10 is linear-in-data, >> 10 is super-linear (the thing the curve
exists to catch across TWO decades, not one).
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    iso = doc.get("isolated", doc)
    return {k: v.get("median", -1) for k, v in iso.items()
            if isinstance(v, dict)}


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    legs = []
    for arg in sys.argv[1:]:
        label, path = arg.split("=", 1)
        legs.append((label, load(path)))
    names = sorted(set().union(*[set(m) for _, m in legs]))
    hdr = ["query"] + [l for l, _ in legs]
    for i in range(1, len(legs)):
        hdr.append(f"{legs[i][0]}/{legs[i-1][0]}")
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    rows = {}
    for n in names:
        meds = [m.get(n, -1) for _, m in legs]
        cells = [f"{v:.2f}" if v >= 0 else "—" for v in meds]
        ratios = []
        for i in range(1, len(meds)):
            if meds[i] > 0 and meds[i - 1] > 0:
                ratios.append(f"{meds[i] / meds[i-1]:.2f}x")
            else:
                ratios.append("—")
        print("| " + " | ".join([n] + cells + ratios) + " |")
        rows[n] = {legs[i][0]: meds[i] for i in range(len(legs))}
    totals = [sum(v for v in m.values() if v > 0) for _, m in legs]
    tcells = [f"{t:.1f}" for t in totals]
    tratios = [f"{totals[i] / totals[i-1]:.2f}x" if totals[i - 1] > 0
               else "—" for i in range(1, len(totals))]
    print("| **total** | " + " | ".join(tcells + tratios) + " |")
    print()
    print(json.dumps({"legs": [l for l, _ in legs], "queries": rows,
                      "totals": {legs[i][0]: totals[i]
                                 for i in range(len(legs))}},
                     sort_keys=True))


if __name__ == "__main__":
    main()
