#!/usr/bin/env python3
"""Regenerate the bench-history table in README.md from BENCH_r*.json.

Each per-round artifact wraps the one-line JSON that graft.Bench prints
(under "parsed", or only inside the captured "tail" for early rounds
whose per-query line overflowed the driver's capture window). Rounds 1-4
reported min-of-2 per query; round 6+ reports median-of-3.

Usage: python3 tools/bench_history.py   (rewrites the marked README block)

Driver-side tooling only — the shipped Scala library never imports this.
"""
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- bench-history:begin -->"
END = "<!-- bench-history:end -->"

# families worth a column (the big movers); everything else folds into
# "rest" so the table stays readable as families are added
SHOWN = ["dd", "inc", "q", "samp", "sim", "txt"]


def family(name):
    g = re.match(r"[a-zA-Z]*", name.split("_")[0]).group(0)
    return g or "x"


def load_round(path):
    d = json.load(open(path))
    parsed = d.get("parsed")
    if not parsed:
        # early rounds: recover the JSON line from the captured tail
        m = [l for l in d.get("tail", "").splitlines()
             if l.startswith('{"metric"')]
        if not m:
            return None
        parsed = json.loads(m[-1])
    qs = parsed.get("queries", {})
    # group-subtotal lines (r3+) vs per-query lines (r1/r2): per-query
    # names contain an underscore or digits; group keys are bare letters
    per_query = any(re.search(r"[_\d]", k) for k in qs)
    fams = {}
    for k, v in qs.items():
        if v < 0:
            continue
        f = family(k) if per_query else k
        fams[f] = fams.get(f, 0.0) + v
    n = parsed.get("n", len(qs) if per_query else None)
    return {
        "total": parsed.get("value"),
        "n": n,
        "failed": parsed.get("failed", 0),
        "fams": fams,
    }


def main():
    rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        rnd = re.search(r"BENCH_r(\d+)\.json", path)
        if not rnd:
            continue
        data = load_round(path)
        if data:
            rows.append((int(rnd.group(1)), data))
    lines = [
        "| round | queries | failed | total s | "
        + " | ".join(f"{f} s" for f in SHOWN) + " | rest s |",
        "|---|---|---|---|" + "---|" * (len(SHOWN) + 1),
    ]
    for rnd, d in rows:
        shown_sum = sum(d["fams"].get(f, 0.0) for f in SHOWN)
        rest = (d["total"] or 0.0) - shown_sum
        cells = [str(rnd), str(d["n"]), str(d["failed"]),
                 f"{d['total']:.1f}"]
        cells += [f"{d['fams'].get(f, 0.0):.1f}" for f in SHOWN]
        cells += [f"{rest:.1f}"]
        lines.append("| " + " | ".join(cells) + " |")
    block = "\n".join(lines)

    readme = os.path.join(REPO, "README.md")
    text = open(readme).read()
    if BEGIN in text and END in text:
        pre, rest = text.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        text = pre + BEGIN + "\n" + block + "\n" + END + post
    else:
        text += (
            "\n## Bench history (sf0.1, driver runs)\n\n"
            "Per-round totals from `BENCH_r*.json`. Rounds 1-2 are "
            "unrecoverable (their per-query stdout line overflowed the "
            "driver's capture window — the regression that led to group "
            "subtotals). Rounds 3-4 are min-of-2 per query, round 5 "
            "min-of-2 on a noisy machine (see VERDICT r5), round 6+ "
            "median-of-3 (`Bench` pins per-query medians; spreads live "
            "in `BENCH_FULL.json`).\n\n"
            + BEGIN + "\n" + block + "\n" + END + "\n")
    open(readme, "w").write(text)
    print(block)


if __name__ == "__main__":
    main()
