"""Scale-linearity report: compare two scale_sweep JSONs and flag curves.

Usage:
    python tools/scale_report.py SWEEP_SMALL.json SWEEP_BIG.json FACTOR

For each query present in both sweeps, computes ratio = big_sec / small_sec
and classifies it against the data-growth FACTOR (e.g. 10 for sf0.1->sf1):

- ``sub``     ratio <= 0.5 * factor   (fixed overhead dominates / broadcast
                                       or index-probe paths — expected for
                                       most queries at these small SFs)
- ``linear``  ratio <= 1.5 * factor   (scales with data, the target shape)
- ``super``   ratio  > 1.5 * factor   (flag: the plan has a quadratic or
                                       skew component — fix or document)

Short-running queries are noise-dominated (JVM scheduling jitter is
~0.1-0.3 s per query, comparable to a sub-second query's entire runtime),
so ratios are only *classified* when the big-side time exceeds MIN_BIG_SEC;
everything below that is reported as ``noise`` and never flagged.

Emits one human table (stdout) and one JSON line (summary) so the driver
and BENCH_NOTES can both consume it.
"""

from __future__ import annotations

import json
import sys

MIN_BIG_SEC = 2.0


def main() -> None:
    small_path, big_path, factor_s = sys.argv[1], sys.argv[2], sys.argv[3]
    factor = float(factor_s)
    with open(small_path) as f:
        small = json.load(f)["queries"]
    with open(big_path) as f:
        big = json.load(f)["queries"]

    rows = []
    counts = {"sub": 0, "linear": 0, "super": 0, "noise": 0}
    for name in sorted(set(small) & set(big)):
        s, b = small[name]["sec"], big[name]["sec"]
        ratio = b / s if s > 0 else float("inf")
        if b < MIN_BIG_SEC:
            cls = "noise"
        elif ratio <= 0.5 * factor:
            cls = "sub"
        elif ratio <= 1.5 * factor:
            cls = "linear"
        else:
            cls = "super"
        counts[cls] += 1
        rows.append((name, s, b, ratio, cls))

    rows.sort(key=lambda r: -r[3])
    print(f"{'query':46s} {'small':>8s} {'big':>8s} {'ratio':>7s}  class")
    for name, s, b, ratio, cls in rows:
        if cls == "noise":
            continue
        print(f"{name:46s} {s:8.2f} {b:8.2f} {ratio:6.1f}x  {cls}")
    noise = [r[0] for r in rows if r[4] == "noise"]
    print(f"... plus {len(noise)} queries with big-side < {MIN_BIG_SEC}s (noise floor)")

    summary = {
        "metric": "scale_linearity",
        "factor": factor,
        "classified": {k: v for k, v in counts.items()},
        "super_linear": [
            {"query": n, "small_sec": s, "big_sec": b, "ratio": round(r, 1)}
            for n, s, b, r, c in rows
            if c == "super"
        ],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
