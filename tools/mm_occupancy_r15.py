"""Occupancy-vs-corpus curve for the mm hyperplane signature (r15):
mm_index_stats at sf0.1 / sf1 / sf10d, recording per-table n_buckets /
max_bucket / n_hot_buckets alongside the adaptive plane count, so the
corpus-adaptive signature width's claim — expected bucket bounded at
~_MM_BUCKET as the media corpus grows — is a measured row, not an
argument. max_bucket ABOVE the expected envelope is replica skew
(byte-identical payloads share all planes); the probe's numpy screen
exists for exactly that, and this is the number that watches it.

Usage: python tools/mm_occupancy_r15.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

DOC_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scale/sf1"),
    ("sf10d", "/root/repo/.scale/sf10d"),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MM_OCCUPANCY_r15.json"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from psql_streamer_spark.operators.multimodal import (
        _MM_BUCKET,
        _mm_planes,
        mm_index_stats,
    )
    from psql_streamer_spark.sources.tables import load_table

    results = []
    for label, d in DOC_DIRS:
        if not os.path.isdir(d):
            continue
        n_docs = load_table(spark, "documents", d).count()
        p = _mm_planes(n_docs)
        t0 = time.monotonic()
        rows = mm_index_stats(spark, d).collect()
        wall = round(time.monotonic() - t0, 2)
        for r in rows:
            results.append(
                {
                    "sf": label,
                    "n_docs": n_docs,
                    "planes": p,
                    "expected_bucket": round(n_docs / (1 << p), 1),
                    "tbl": r.tbl,
                    "n_postings": r.n_postings,
                    "n_buckets": r.n_buckets,
                    "max_bucket": r.max_bucket,
                    "n_hot_buckets": r.n_hot_buckets,
                    "sec": wall,
                }
            )
        print(
            f"{label}: n={n_docs} p={p} exp={n_docs / (1 << p):.0f} "
            f"max_bucket={[r.max_bucket for r in rows]} ({wall}s)",
            flush=True,
        )
    with open(out_path, "w") as fh:
        json.dump({"bucket_target": _MM_BUCKET, "rows": results}, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
