"""Warm-path serving benchmark for the incremental MEDIA near-dup miner —
the mm twin of tools/bench_incremental.py.

Shape (the daily-ingest contract the materialized posting index exists
for): the corpus histogram/signature work is paid ONCE at index build;
each subsequent "day" probes the bucketed posting table with a different
md5 delta bucket and verifies exact cosine over candidate documents only.
Compare against the full miner, which re-histograms and re-buckets the
whole corpus every run.

Usage:
    python tools/bench_incremental_mm.py [sf_dir] [n_probes]
    SPARK_GRAFT_INCR_OUT=BENCH_INCR_MM_r14.json python tools/bench_incremental_mm.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> int:
    return df.count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from psql_streamer_spark.operators.multimodal import (
        mm_bucket_index_table,
        mm_dedup_embedding,
        mm_dedup_embedding_incremental,
    )
    from psql_streamer_spark.session import get_spark

    spark = get_spark("bench_incremental_mm")
    rec: dict = {"metric": "bench_incremental_mm", "sf_dir": sf_dir,
                 "n_probes": n_probes}
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    # full miner: the whole-corpus mine a daily pipeline should NOT run
    t0 = time.time()
    rec["full_miner_pairs"] = _force(mm_dedup_embedding(spark, sf_dir))
    rec["full_miner_sec"] = round(time.time() - t0, 3)

    # materialized index: built once (the ingest-amortized artifact)
    t0 = time.time()
    mm_bucket_index_table(spark, sf_dir)
    rec["index_build_sec"] = round(time.time() - t0, 3)

    # N successive "days": one delta bucket each, warm index
    probes, pairs = [], []
    for day in range(n_probes):
        t0 = time.time()
        pairs.append(
            _force(mm_dedup_embedding_incremental(spark, sf_dir, bucket=day))
        )
        probes.append(round(time.time() - t0, 3))
    rec["probe_sec"] = probes
    rec["probe_pairs"] = pairs

    line = json.dumps(rec)
    print(line)
    out = os.environ.get("SPARK_GRAFT_INCR_OUT")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
