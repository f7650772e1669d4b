"""Dedup quality (recall/precision) + per-tier latency across scale points.

r10 gave the ANN tiers a measured quality decade (RECALL artifacts); the
dedup tiers' recall/precision existed only at sf0.1. This tool runs the
registered, hash-checked ``dedup_quality_report`` at each given sf dir
plus a per-tier COLD latency column (index cache cleared before each
tier, so the timing pays that tier's full index build + mine — the
"first run of the day" cost a production pipeline budgets), and records
the exact-Jaccard ground-truth cost separately (it is the O(df^2)
declared-sample-scale tier: measuring it IS the point of keeping it out
of corpus-scale sweeps).

Each scale point runs in its own subprocess (fresh session — same
isolation rationale as tools/recall_scale.py's knob sweep).

Usage:
    python tools/dedup_quality_scale.py [sf_dir ...]
    # default: sf0.1 -> sf1 -> sf3 (5k / 50k / 150k docs — the
    # QUALITY_r11.json decade-and-a-half)
    SPARK_GRAFT_QUALITY_OUT=QUALITY_r11.json python tools/dedup_quality_scale.py
    # child mode: one point
    python tools/dedup_quality_scale.py --point /root/repo/.scale/sf1
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIER_OPS = (
    ("minhash_lsh", "dedup_minhash_lsh_pairs"),
    ("simhash", "dedup_simhash_pairs"),
    ("simhash64", "dedup_simhash64_pairs"),
    ("simhash64_wide", "dedup_simhash64_pairs_wide"),
)


def point(sf_dir: str) -> None:
    from psql_streamer_spark.caching import INDEX_CACHE
    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.warmup import warm_expression_paths

    spark = get_spark("dedup_quality")
    warm_expression_paths(spark)
    queries = all_queries()
    rec: dict = {"sf_dir": sf_dir}
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    import duckdb  # row count for context, metadata-only

    rec["n_docs"] = duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/documents.parquet"
        f"{'/*.parquet' if os.path.isdir(os.path.join(sf_dir, 'documents.parquet')) else ''}')"
    ).fetchone()[0]

    # ground truth: the quadratic exact-Jaccard miner, timed cold
    INDEX_CACHE.clear()
    t0 = time.time()
    rec["n_truth"] = queries["dedup_ngram_jaccard_pairs"](spark, sf_dir).count()
    rec["truth_sec"] = round(time.time() - t0, 3)

    # per-tier cold latency: cache cleared first, so each number pays the
    # tier's full index build + pair mine (build-once cost; steady-state
    # probe costs are the incremental miner's benchmark, not this one)
    tiers: dict[str, dict] = {}
    for tier, op in TIER_OPS:
        INDEX_CACHE.clear()
        t0 = time.time()
        n = queries[op](spark, sf_dir).count()
        tiers[tier] = {"cold_sec": round(time.time() - t0, 3), "n_pairs": n}

    # quality rows (indexes warm from the loop above — the report's own
    # wall time is not the comparison axis, recall/precision are)
    t0 = time.time()
    for r in queries["dedup_quality_report"](spark, sf_dir).collect():
        tiers[r.tier].update(
            n_hits=int(r.n_hits),
            recall=round(float(r.recall), 4) if r.recall is not None else None,
            precision=(
                round(float(r.precision), 4) if r.precision is not None else None
            ),
        )
    rec["report_sec"] = round(time.time() - t0, 3)
    rec["tiers"] = tiers
    print(json.dumps(rec), flush=True)


def main() -> None:
    if "--point" in sys.argv:
        point(sys.argv[sys.argv.index("--point") + 1])
        return
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.scale/sf1",
        "/root/repo/.scale/sf3",
    ]
    points = []
    for sf_dir in dirs:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--point", sf_dir],
            capture_output=True, text=True, check=True,
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        points.append(rec)
        print(json.dumps(rec), flush=True)
    summary = {"metric": "dedup_quality_scale", "points": points}
    out_path = os.environ.get("SPARK_GRAFT_QUALITY_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
