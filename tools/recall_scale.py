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

Knob sweep (last dir only — the inflated decade point where the knobs
matter): each knob point runs in its OWN subprocess with a fresh
SparkSession (r10 verdict task 3 — the r10 in-session sweep's latency
column was warm-up-contaminated: more probes read FASTER because they
ran later). The child warms the session uniformly (expression paths +
the exact brute-force pass, which both computes the recall ground truth
and warms the embedding scan), then times the tier cold + warm-best —
so the latency column compares knob settings, not session ages.

Usage:
    python tools/recall_scale.py [sf_dir ...]
    # default: /root/testdata/sf0.1 /root/repo/.scale/sf10
    SPARK_GRAFT_RECALL_OUT=RECALL_r11.json python tools/recall_scale.py
    # child mode (spawned by the sweep, one knob per process):
    python tools/recall_scale.py --knob ivf_nprobe=6 /root/repo/.scale/sf10
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psql_streamer_spark.session import get_spark  # noqa: E402

KNOBS = ("ivf_nprobe=3", "ivf_nprobe=6", "ivf_nprobe=10", "ivf_nprobe=scaled",
         "ivf_kmeans=trained",
         "lsh_tables=4", "lsh_tables=8")

#: bench.py's calibrated contention line (r11): a knob point recorded at
#: loadavg_1m >= 4.0 is contended by the repo's own standard and its
#: latency column must not be read as a clean recall/cost trade.
CONTENDED_LOADAVG = 4.0


def _tier_fn(knob: str):
    from psql_streamer_spark.operators.similarity import (
        RECALL_K,
        _ivf_stride_topk,
        _lsh_topk,
        sim_ivf_kmeans_topk,
    )

    name, _, val = knob.partition("=")
    if name == "ivf_nprobe":
        nprobe = None if val == "scaled" else int(val)
        return lambda spark, sf_dir: _ivf_stride_topk(
            spark, sf_dir, RECALL_K, nprobe=nprobe
        )
    if name == "ivf_kmeans":
        # trained tier returns TOP_K=5 rows/query by construction — its
        # recall compares against the exact@5 prefix (same convention as
        # the summary's recall_ivf_kmeans_at5)
        return lambda spark, sf_dir: sim_ivf_kmeans_topk(spark, sf_dir)
    if name == "lsh_tables":
        return lambda spark, sf_dir: _lsh_topk(
            spark, sf_dir, RECALL_K, tables=int(val)
        )
    raise SystemExit(f"unknown knob {knob!r}")


def knob_point(knob: str, sf_dir: str) -> None:
    """Child mode: one knob setting, one fresh session, one JSON line."""
    from psql_streamer_spark.operators.similarity import (
        RECALL_K,
        _bruteforce_topk,
        _ivf_stride_topk,
    )
    from psql_streamer_spark.warmup import warm_expression_paths

    name, _, val = knob.partition("=")
    k_truth = 5 if name == "ivf_kmeans" else RECALL_K

    rec = {"knob": knob, "sf_dir": sf_dir, "k": k_truth}
    # contention snapshot BEFORE any Spark work (r12): the r11 sweep read
    # loadavg at measurement time — after warmup + the brute-force ground
    # truth, whose 32-thread matmul drives loadavg to ~10 at sf10 all by
    # itself — so the column flagged SELF-load as contention. External
    # contention is the load that exists before this process does work;
    # the at-measurement reading stays recorded separately for honesty.
    try:
        rec["loadavg_1m_start"] = round(os.getloadavg()[0], 2)
        rec["contended"] = rec["loadavg_1m_start"] >= CONTENDED_LOADAVG
    except OSError:
        pass

    spark = get_spark("recall_knob")
    warm_expression_paths(spark)
    # ground truth first: gives recall AND warms the embedding scan the
    # same way for every knob's subsequent timing
    exact = {
        (r.query_id, r.neighbor_id)
        for r in _bruteforce_topk(spark, sf_dir, k_truth).collect()
    }
    fn = _tier_fn(knob)
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    samples = []
    for i in range(3):
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id) for r in fn(spark, sf_dir).collect()
        }
        dt = time.time() - t0
        if i == 0:
            rec["cold_sec"] = round(dt, 3)
            rec["recall"] = (
                round(len(exact & got) / len(exact), 4) if exact else None
            )
        else:
            samples.append(dt)
    rec["sec"] = round(min(samples or [rec["cold_sec"]]), 3)
    # candidate-volume diagnostic (AFTER the timed loop — filling the
    # counters runs an extra count action): says whether IVF probe cost
    # at this point is candidate-bound (sec tracks candidates) or
    # fixed-overhead-bound (sec flat while candidates scale with nprobe)
    if name == "ivf_nprobe":
        counters: dict = {}
        _ivf_stride_topk(
            spark, sf_dir, RECALL_K,
            nprobe=None if val == "scaled" else int(val),
            counters=counters,
        )
        rec["nprobe_resolved"] = counters.get("nprobe")
        rec["candidates"] = counters.get("candidates")
    print(json.dumps(rec), flush=True)


def main() -> None:
    if "--knob" in sys.argv:
        i = sys.argv.index("--knob")
        knob_point(sys.argv[i + 1], sys.argv[i + 2])
        return

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/.scale/sf10"]
    spark = get_spark("recall_scale")
    from psql_streamer_spark.operators.similarity import (
        RECALL_K,
        _bruteforce_topk,
        sim_ivf_kmeans_topk,
        sim_recall_report,
    )

    points = []
    for i, sf_dir in enumerate(dirs):
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

        # knob sweep on the LAST dir by loop index (not path string
        # equality — a repeated/differently-spelled argument used to run
        # the sweep on the wrong pass, r10 advice), one fresh subprocess
        # per knob point for latency isolation
        if i == len(dirs) - 1 and exact:
            knobs = []
            for knob in KNOBS:
                # cool down before each child (r12): the previous child's
                # (and this parent's) own work elevates the trailing 1m
                # loadavg; spawning back-to-back made every r11 point read
                # contended by the repo's own standard. Wait for the host
                # to drop below half the contended line, bounded.
                deadline = time.time() + 300
                while time.time() < deadline:
                    try:
                        if os.getloadavg()[0] < CONTENDED_LOADAVG / 2:
                            break
                    except OSError:
                        break
                    time.sleep(5)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--knob", knob, sf_dir],
                    capture_output=True, text=True, check=True,
                )
                knobs.append(json.loads(out.stdout.strip().splitlines()[-1]))
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
