#!/usr/bin/env python3
"""Probe-aware per-query diff of two BENCH_FULL.json artifacts.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [threshold]

For every query whose median moved more than `threshold` (relative,
default 0.30) AND more than 0.15 s absolute, prints the delta together
with each side's bracketing-probe load — so a reviewer can separate
"this query regressed" from "this query's window was loaded" without
re-running anything. Queries measured under a loaded window (probe
max > 1.3) on EITHER side are marked; a regression is only trustworthy
when both windows were quiet. Exits 1 if any trustworthy regression
exceeds the threshold (usable as a soft gate).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def window_load(probes, idx):
    """Max of the last probe at/before the query's sweep index and the
    first after it (mirrors Bench.windowLoad)."""
    before = [p["sec"] for p in probes if p["at"] <= idx]
    after = [p["sec"] for p in probes if p["at"] > idx]
    return max(before[-1] if before else 0.0, after[0] if after else 0.0)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
    oq, nq = old["queries"], new["queries"]
    # sweep order is sorted names — recover each query's probe index
    names_old = sorted(oq)
    names_new = sorted(nq)
    op, np_ = old.get("load_probes", []), new.get("load_probes", [])
    regress, improve = [], []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            continue
        if abs(b - a) < 0.15 or abs(b - a) / a < thr:
            continue
        wl_old = window_load(op, names_old.index(name))
        wl_new = window_load(np_, names_new.index(name))
        retried = name in new.get("retried", {})
        row = (name, a, b, wl_old, wl_new, retried)
        (regress if b > a else improve).append(row)

    def show(rows, tag):
        for name, a, b, wo, wn, rt in sorted(rows, key=lambda r: -abs(r[2] - r[1])):
            loaded = []
            if wo > 1.3:
                loaded.append(f"old window {wo:.2f}")
            if wn > 1.3:
                loaded.append(f"new window {wn:.2f}")
            mark = f"  [LOADED: {', '.join(loaded)}]" if loaded else ""
            mark += "  [retried]" if rt else ""
            print(f"{tag} {name}: {a:.2f} -> {b:.2f} s "
                  f"({(b - a) / a * 100:+.0f}%){mark}")

    show(regress, "SLOWER ")
    show(improve, "faster ")
    trustworthy = [r for r in regress if r[3] <= 1.3 and r[4] <= 1.3]
    print(f"\n{len(regress)} slower ({len(trustworthy)} with quiet windows "
          f"on both sides), {len(improve)} faster; "
          f"lf old {old.get('load_factor')} new {new.get('load_factor')}")
    sys.exit(1 if trustworthy else 0)


if __name__ == "__main__":
    main()
