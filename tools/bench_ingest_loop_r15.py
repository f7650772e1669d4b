"""Multi-day SERVING benchmark for the closed fused-ingest loop (r15).

The r14 loop landed with two unmeasured growth terms: the per-epoch
``admitted_dir/epoch=*`` listing + union + semi-join scan grows
O(admissions), and at-least-once posting appends accumulate duplicates
with no wired compaction. This tool runs the BENCH_INCR shape against
the loop itself: ONE loop state (private posting table + admitted store
+ checkpoint), fed N successive "days" (one drop file per day, drained
with availableNow, same checkpoint — so each day is one epoch probing
ALL prior days' admissions), recording per-day wall, partition-listing
size, and index growth. Run twice — compact_every=None (the r14 shape)
vs a wired cadence — the delta IS the compaction's case.

Day k's documents are corpus docs from md5 bucket k re-keyed to fresh
ids: a natural mix of near-dups of the base corpus (rejected) and
novel admissions, plus — from day 1 on — re-keyed near-copies of day
k-1's documents, which only the CLOSED loop state can reject.

Usage:
    python tools/bench_ingest_loop_r15.py [sf_dir] [n_days] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_INCR_LOOP_r15.json"

    from pyspark.sql import functions as F

    from psql_streamer_spark.functions.text_hash import (
        shingles_expr,
        with_words,
    )
    from psql_streamer_spark.operators.dedup import (
        BAND_INDEX_BUCKETS,
        band_index_table,
    )
    from psql_streamer_spark.operators.mlprep import (
        DECONTAM_EVAL_SOURCE,
        DECONTAM_K,
        _eval_bloom_positions,
        build_bloom_words,
        md5_bucket,
    )
    from psql_streamer_spark.operators.text import _qm_train
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.fused_gate import (
        _admitted_base_bound,
        start_fused_ingest_loop,
    )

    spark = get_spark("bench_ingest_loop")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, "documents", sf_dir)
    t0 = time.time()
    base_table = band_index_table(spark, sf_dir)
    bloom_words = build_bloom_words(_eval_bloom_positions(spark, sf_dir))
    bench_grams = (
        with_words(d.filter(F.col("source") == DECONTAM_EVAL_SOURCE))
        .select(
            F.explode(shingles_expr(F.col("__words"), k=DECONTAM_K)).alias("g")
        )
        .distinct()
        .persist()
    )
    bench_grams.count()
    w, _ = _qm_train(spark, sf_dir)
    state_build_sec = round(time.time() - t0, 2)

    # pre-materialize each day's delta: corpus bucket-k docs re-keyed and
    # word-REVERSED (novel 3-shingles — a byte copy would be rejected
    # against its corpus twin and the admitted store would never grow),
    # plus near-copies of day k-1's docs (last word swapped) which only
    # the closed loop state can reject
    days: list[list[tuple[int, str]]] = []
    for k in range(n_days):
        rows = (
            d.filter(md5_bucket(F.col("doc_id"), n_days) == k)
            .select("doc_id", "text")
            .collect()
        )
        day = [
            (
                10_000_000 + k * 100_000 + i,
                " ".join(reversed(r.text.split())),
            )
            for i, r in enumerate(rows)
        ]
        if k > 0:
            for j, (_, text) in enumerate(days[k - 1][:40]):
                ws = text.split()
                if len(ws) > 3:
                    ws[-1] = "daycopy"
                    day.append((20_000_000 + k * 100_000 + j, " ".join(ws)))
        days.append(day)
    sizes = [len(x) for x in days]
    print(f"state_build={state_build_sec}s day_sizes={sizes}", flush=True)

    def run_config(tag: str, compact_every: int | None) -> dict:
        work = tempfile.mkdtemp(prefix=f"loop_bench_{tag}_")
        src = os.path.join(work, "src")
        os.makedirs(src)
        verdicts = os.path.join(work, "verdicts")
        admitted = os.path.join(work, "admitted")
        ckpt = os.path.join(work, "ckpt")
        loop_tbl = f"bench_loop_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {loop_tbl}")
        (
            spark.table(base_table)
            .write.bucketBy(BAND_INDEX_BUCKETS, "bkey")
            .sortBy("bkey")
            .mode("overwrite")
            .saveAsTable(loop_tbl)
        )
        per_day = []
        try:
            for k, day in enumerate(days):
                fp = os.path.join(src, f"day{k:03d}.json")
                with open(fp, "w") as fh:
                    for did, text in day:
                        fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")
                n_dirs = sum(
                    1
                    for n in (
                        os.listdir(admitted) if os.path.isdir(admitted) else []
                    )
                    if n.startswith("epoch=")
                )
                t0 = time.time()
                q = start_fused_ingest_loop(
                    spark,
                    src,
                    loop_tbl,
                    d,
                    bloom_words,
                    bench_grams,
                    w,
                    verdicts,
                    admitted,
                    ckpt,
                    compact_every=compact_every,
                )
                assert q.awaitTermination(600), f"day {k} did not drain"
                wall = round(time.time() - t0, 2)
                row = {
                    "day": k,
                    "docs": len(day),
                    "wall_sec": wall,
                    "epoch_dirs_before": n_dirs,
                    "index_rows": spark.table(loop_tbl).count(),
                    "base_bound": _admitted_base_bound(admitted),
                }
                per_day.append(row)
                print(f"{tag} {row}", flush=True)
            adm = spark.read.parquet(verdicts)
            summary = {
                "docs_total": int(adm.count()),
                "admitted_total": int(
                    adm.filter(F.col("admit")).count()
                ),
                "rejected_near_dup": int(
                    adm.filter(F.col("n_near_dup") > 0).count()
                ),
            }
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {loop_tbl}")
            shutil.rmtree(work, ignore_errors=True)
        return {
            "compact_every": compact_every,
            "per_day": per_day,
            **summary,
        }

    result = {
        "metric": "fused_ingest_loop_days",
        "sf_dir": sf_dir,
        "n_days": n_days,
        "state_build_sec": state_build_sec,
        "configs": {
            "uncompacted": run_config("u", None),
            "compact_every_4": run_config("c", 4),
        },
    }
    bench_grams.unpersist()
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
