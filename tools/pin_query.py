"""Isolated pin for any registered query — the adjudication protocol.

The driver's per-round BENCH_r{N}.json shares its session (and the
machine) with whatever else the driver ran; round-over-round deltas
beyond the recorded spread band need a session/machine-state vs
real-regression call. This tool is the generic form of the
pin_bruteforce protocol: ONE fresh SparkSession per invocation, the
standard bench warmup, then each named query timed cold + warm-best
exactly like bench.py (noop sink, no collect). Run it >= 3 times,
counterbalancing order with --reverse on alternate runs so
scan/JIT warmth hits each query equally across the set:

    for i in 1 2 3; do
      python tools/pin_query.py sim_bruteforce_topk text_quality_scores \
        evt_session_windows_30m $([ $((i % 2)) = 0 ] && echo --reverse)
    done

Each invocation prints ONE JSON line (loadavg snapshot in-band so a
contended pin run is self-identifying). Compare the warm-best across
the 3 pins to the driver artifact: pins tight and below the driver
number => session/machine state; pins at the driver number => real,
bisect the diff.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reverse = "--reverse" in sys.argv
    if not args:
        print("usage: pin_query.py QUERY [QUERY ...] [--reverse]", file=sys.stderr)
        raise SystemExit(2)
    if reverse:
        args = args[::-1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.warmup import warm_expression_paths

    rec: dict = {"sf_dir": sf_dir, "order": list(args)}
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    spark = get_spark("pin_query")
    queries = all_queries()
    # same warmup as bench.py: JVM/parquet-footer/Arrow-worker one-time
    # costs out of the measured numbers, no measured-table precompute
    load_table(spark, "lineitem", sf_dir).select("l_orderkey").limit(1).collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    warm_expression_paths(spark)

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    for name in args:
        fn = queries[name]
        samples = []
        for i in range(iters):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i == 0:
                rec[name + "_cold"] = round(dt, 3)
            else:
                samples.append(dt)
        warm = samples or [rec[name + "_cold"]]
        rec[name] = round(min(warm), 3)
        rec[name + "_spread"] = round(max(warm) - min(warm), 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
