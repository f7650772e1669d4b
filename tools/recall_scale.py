"""Measured recall@k for the untrained ANN tiers across the scale decade.

The approximate tiers (sim_lsh_topk, sim_ivf_topk) are oracle-checked by
REPLAYING the same algorithm in DuckDB — that proves the implementation,
not the retrieval quality. This tool runs the registered, hash-checked
``sim_recall_report`` (recall@10 vs exact brute force, per tier) at each
given sf dir and emits one JSON line per point plus a summary artifact,
so the LSH table/plane and IVF probe knobs have a measured QUALITY axis
to go with the latency axis the scale sweeps already record.

The trained k-means tier is iterative (no SQL oracle); its recall is
asserted in tests/test_quality_metrics.py and reported here via the same
set-intersection computed driver-side (both frames are Q*k rows).

Usage:
    python tools/recall_scale.py [sf_dir ...]
    # default: /root/testdata/sf0.1 /root/repo/.scale/sf10
    SPARK_GRAFT_RECALL_OUT=RECALL_r10.json python tools/recall_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psql_streamer_spark.session import get_spark  # noqa: E402


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/.scale/sf10"]
    spark = get_spark("recall_scale")
    from psql_streamer_spark.operators.similarity import (
        RECALL_K,
        _bruteforce_topk,
        sim_ivf_kmeans_topk,
        sim_recall_report,
    )

    from psql_streamer_spark.operators.similarity import _ivf_stride_topk, _lsh_topk

    points = []
    for sf_dir in dirs:
        t0 = time.time()
        rows = sim_recall_report(spark, sf_dir).collect()
        report_sec = round(time.time() - t0, 3)
        rec = {
            "sf_dir": sf_dir,
            "k": RECALL_K,
            "report_sec": report_sec,
            "n_expected": int(rows[0].n_expected) if rows else 0,
        }
        for r in rows:
            rec[f"recall_{r.tier}"] = round(float(r.recall), 4)
        # trained k-means tier: same recall@k, set intersection computed
        # driver-side over the two Q*k-row frames (model-sized collects)
        t0 = time.time()
        exact = {
            (r.query_id, r.neighbor_id)
            for r in _bruteforce_topk(spark, sf_dir, RECALL_K).collect()
        }
        km = {
            (r.query_id, r.neighbor_id)
            for r in sim_ivf_kmeans_topk(spark, sf_dir).collect()
        }
        # sim_ivf_kmeans_topk returns TOP_K=5 rows/query; recall@5-of-10
        # understates, so report it against the matching exact@5 prefix
        exact5 = {
            (r.query_id, r.neighbor_id)
            for r in _bruteforce_topk(spark, sf_dir, 5).collect()
        }
        rec["recall_ivf_kmeans_at5"] = (
            round(len(exact5 & km) / len(exact5), 4) if exact5 else None
        )
        rec["kmeans_sec"] = round(time.time() - t0, 3)

        # Knob sweep (last dir only — the inflated decade point, where
        # the knobs matter): recall@k and latency per knob setting, so
        # nprobe and the LSH OR-width have a measured quality/cost curve
        # rather than a single default reading.
        if sf_dir == dirs[-1] and exact:
            knobs = []
            for nprobe in (3, 6, 10):
                t0 = time.time()
                got = {
                    (r.query_id, r.neighbor_id)
                    for r in _ivf_stride_topk(
                        spark, sf_dir, RECALL_K, nprobe=nprobe
                    ).collect()
                }
                knobs.append(
                    {
                        "knob": f"ivf_nprobe={nprobe}",
                        "recall": round(len(exact & got) / len(exact), 4),
                        "sec": round(time.time() - t0, 3),
                    }
                )
            for tables in (4, 8):
                t0 = time.time()
                got = {
                    (r.query_id, r.neighbor_id)
                    for r in _lsh_topk(
                        spark, sf_dir, RECALL_K, tables=tables
                    ).collect()
                }
                knobs.append(
                    {
                        "knob": f"lsh_tables={tables}",
                        "recall": round(len(exact & got) / len(exact), 4),
                        "sec": round(time.time() - t0, 3),
                    }
                )
            rec["knob_sweep"] = knobs
        points.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.environ.get("SPARK_GRAFT_RECALL_OUT")
    summary = {"metric": "ann_recall_scale", "k": RECALL_K, "points": points}
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
