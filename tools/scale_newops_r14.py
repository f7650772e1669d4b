"""Scale check for the round-14 operators: wall time + output rows at
sf0.1 and the inflated .scale document corpora (sf1 = 50k docs, sf10d =
500k docs). Growth curves answer "would this survive 100x", the
same protocol as SCALE_r13_newops.

Usage: python tools/scale_newops_r14.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

DOC_OPS = [
    "pipeline_corpus_prep_report_full",
    "text_langid_model_scores",
    "text_langid_model_confusion",
    "mm_dedup_embedding_incremental",
]

DOC_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scale/sf1"),
    ("sf10d", "/root/repo/.scale/sf10d"),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r14_newops.json"
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
        for op in DOC_OPS:
            t0 = time.monotonic()
            try:
                n = qs[op](spark, d).count()
                wall = round(time.monotonic() - t0, 2)
                results.append(
                    {"op": op, "sf": label, "rows": n, "sec": wall}
                )
                print(f"{op} @ {label}: {n} rows in {wall}s", flush=True)
            except Exception as e:
                results.append(
                    {"op": op, "sf": label, "err": str(e)[:300]}
                )
                print(f"{op} @ {label}: ERR {str(e)[:120]}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"rows": results}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
