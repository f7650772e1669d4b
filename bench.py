"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query executes fully via a noop sink (no driver collect — measures
the distributed plan, not result serialization). Times are per-query
wall-clock; `value` is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _env_snapshot() -> dict:
    """Machine-contention snapshot for bench adjudication: BENCH_r05 read
    11.4 s on a loaded driver machine while three clean runs read
    6.4-7.8 s (uniform ~1.5x inflation, tiny spreads — the loaded-machine
    signature). Recording load and free memory in-band lets a reader
    classify the artifact without a re-run."""
    snap: dict = {}
    try:
        snap["loadavg_1m"], snap["loadavg_5m"], snap["loadavg_15m"] = (
            round(x, 2) for x in os.getloadavg()
        )
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = {
                line.split(":")[0]: int(line.split()[1])
                for line in f
                if line.split(":")[0] in ("MemTotal", "MemAvailable")
            }
        snap["mem_total_gib"] = round(mem.get("MemTotal", 0) / 1048576, 1)
        snap["mem_available_gib"] = round(mem.get("MemAvailable", 0) / 1048576, 1)
    except OSError:
        pass
    return snap

# Representative slice of SURVEY.md §2: relational core, lake layout,
# window/sessionize, CDC hot path, dedup scale path, vector search, text
# quality.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    # fact-side partition pruning (r12): cold pays the write-once
    # ship-month table build (ingest leg), warm is the pruned 3-of-83-
    # directories read — the lake discipline measured every round
    "q6_pruned_shipdate_range",
    "topk_customers_by_revenue",
    "window_running_order_total",
    "evt_session_windows_30m",
    "cdc_envelope_dml_events",
    "cdc_serialize_passthrough",
    "dedup_minhash_lsh_pairs",
    "sim_bruteforce_topk",
    "text_quality_scores",
    "mm_image_features",
]


def main() -> None:
    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.session import get_spark

    env_before = _env_snapshot()
    # A local[32] run wants every core for each sub-second query's stage
    # tail, so background load perturbs warm-best numbers far below the
    # old cpus/2 threshold: BENCH_r10 started at loadavg 5.94,
    # self-reported contended:false, and read three headline queries
    # 20-50% above their isolated re-runs. The r11 pin calibration
    # (tools/pin_query.py, BENCH_NOTES "Round 11"): loadavg 2-3 at start
    # inflates readings ~10% (inside the established +/-15% noise
    # bound), loadavg >= ~4.5 inflates specific queries 20-50% (outside
    # it). Documented threshold: 1-min load >= 4.0 at start =>
    # contended, i.e. "deltas beyond the noise bound are plausibly
    # load, adjudicate before believing them". Raw loadavg stays in
    # env_before/env_after for finer-grained classification.
    contended = env_before.get("loadavg_1m", 0.0) >= 4.0

    spark = get_spark("bench")
    queries = all_queries()

    # warm the JVM, parquet footers, Python/Arrow workers, and the hot
    # interpreted-expression paths (not timed — one-time session costs a
    # long-running application amortizes to zero, not per-query costs).
    # warm_expression_paths runs ONLY on spark.range-generated synthetic
    # rows: it never touches the measured tables and pre-computes no part
    # of any measured query (index caches stay empty — the cold numbers
    # below still pay the full index build on real data).
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.warmup import warm_expression_paths

    load_table(spark, "lineitem", SF_DIR).select("l_orderkey").limit(1).collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    warm_expression_paths(spark)

    # 3 iterations: the first pays codegen compilation + JIT; the best-of
    # number reflects steady-state throughput (what a long-running cluster
    # job actually sees)
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        samples: list[float] = []
        for i in range(iters):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i == 0:
                # first iteration pays codegen + any index build (the
                # materialized-index registry builds eagerly on first use);
                # reported separately so the one-time cost stays visible
                cold[name] = round(dt, 3)
            else:
                samples.append(dt)
        warm = samples or [cold[name]]
        times[name] = round(min(warm), 3)
        # max-min over the warm (steady-state) iterations: the per-query
        # noise band. A round-over-round delta smaller than the union of
        # the two rounds' spreads is noise, not signal.
        spread[name] = round(max(warm) - min(warm), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "queries_cold": cold,
                "queries_spread": spread,
                "sf": sf_val,
                "contended": contended,
                "env_before": env_before,
                "env_after": _env_snapshot(),
            }
        )
    )


if __name__ == "__main__":
    main()
