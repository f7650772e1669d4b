"""Scale re-measure for the round-15 scale knobs: wall time + output rows
at sf0.1 and the inflated .scale document corpora (sf1 = 50k docs, sf10d =
500k docs) for the operators whose scale shape changed this round —
the LANGID_BIGRAM_CAP-bounded trained langid (r14 measured the UNCAPPED
model at 24x wall for the 100x corpus; the capped model's curve is this
tool's reason to exist) and, as they land, the corpus-adaptive mm
signature width. Same protocol as SCALE_r14_newops.

Usage: python tools/scale_newops_r15.py [out.json] [op ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

DEFAULT_OPS = [
    "text_langid_model_scores",
    "text_langid_model_confusion",
]

DOC_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scale/sf1"),
    ("sf10d", "/root/repo/.scale/sf10d"),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r15_newops.json"
    ops = sys.argv[2:] or DEFAULT_OPS
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from psql_streamer_spark.registry import all_queries

    qs = all_queries()
    results: list[dict] = []
    for label, d in DOC_DIRS:
        if not os.path.isdir(d):
            continue
        for op in ops:
            t0 = time.monotonic()
            try:
                n = qs[op](spark, d).count()
                wall = round(time.monotonic() - t0, 2)
                results.append(
                    {"op": op, "sf": label, "rows": n, "sec": wall}
                )
                print(f"{op} @ {label}: {n} rows in {wall}s", flush=True)
            except Exception as exc:  # record, keep sweeping
                results.append(
                    {"op": op, "sf": label, "err": str(exc)[:300]}
                )
                print(f"{op} @ {label}: ERROR {exc}", flush=True)
    with open(out_path, "w") as fh:
        json.dump({"rows": results}, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
