"""Measured partition-pruning speedup at an inflated scale point.

The r11 date-partitioned lake layout (operators/event_time.py) is
plan-guarded (PartitionFilters, 3 of 30 directories); this tool measures
what the plan shape BUYS: the same 3-day rollup computed (a) from the
raw single-directory parquet — full scan, predicate evaluated per row —
vs (b) from the date-partitioned copy — 27 of 30 directories never
opened. Also records the one-time partitioned-write cost (the ingest
side pays it once; every time-ranged query amortizes it).

Expectation at any SF: pruned cold ~ (days-in-range / days-total) of the
full-scan cold, because the dominant cost is the parquet scan itself.
Run at .scale/sf10 (10M events) the effect is page-cache-visible; at
100 TB it is the difference between a job and a lake scan.

Usage:
    python tools/pruning_scale.py [sf_dir]       # default .scale/sf10
    SPARK_GRAFT_LAKE_OUT=LAKE_r11.json python tools/pruning_scale.py
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"

    from psql_streamer_spark.functions.numeric import dsum
    from psql_streamer_spark.operators.event_time import (
        EVT_PRUNE_END,
        EVT_PRUNE_START,
    )
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.warmup import warm_expression_paths

    spark = get_spark("pruning_scale")
    warm_expression_paths(spark)

    tag = re.sub(r"\W+", "_", sf_dir.strip("/"))
    lake = f"/root/repo/.scale/lake_{tag}"
    rec: dict = {"sf_dir": sf_dir, "range": [EVT_PRUNE_START, EVT_PRUNE_END]}
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    e = load_table(spark, "events", sf_dir)
    rec["n_events"] = e.count()

    # one-time ingest cost: write the date-partitioned copy (fresh each
    # run — this tool measures, it doesn't cache)
    if os.path.exists(lake):
        shutil.rmtree(lake)
    t0 = time.time()
    e.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(lake)
    rec["partitioned_write_sec"] = round(time.time() - t0, 3)

    def rollup(df, date_col):
        return (
            df.filter(
                (date_col >= F.lit(EVT_PRUNE_START).cast("date"))
                & (date_col <= F.lit(EVT_PRUNE_END).cast("date"))
            )
            .groupBy(date_col.alias("event_day"), "event_type")
            .agg(F.count("*").alias("n"), dsum("value").alias("v"))
        )

    def timed(tag_: str, build) -> None:
        samples = []
        for i in range(3):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i == 0:
                rec[f"{tag_}_cold_sec"] = round(dt, 3)
            else:
                samples.append(dt)
        rec[f"{tag_}_warm_sec"] = round(min(samples), 3)

    # (a) full scan of the raw single-directory parquet
    timed("full_scan", lambda: rollup(load_table(spark, "events", sf_dir),
                                      F.to_date("ts")))
    # (b) pruned scan of the partitioned copy
    part = spark.read.parquet(lake)
    timed("pruned", lambda: rollup(part, F.col("event_date")))

    # parity: both forms compute the identical rollup
    a = rollup(load_table(spark, "events", sf_dir), F.to_date("ts"))
    b = rollup(part, F.col("event_date"))
    rec["rows"] = a.count()
    rec["parity"] = (
        rec["rows"] == b.count()
        and a.exceptAll(b).isEmpty()
        and b.exceptAll(a).isEmpty()
    )
    rec["pruned_vs_full_cold"] = round(
        rec["pruned_cold_sec"] / rec["full_scan_cold_sec"], 3
    )

    # Bytes are the 100 TB metric, wall-clock is the local[32] one: at
    # this SF the whole table is ~200 MB so both scans are
    # scheduling-bound and the wall-clock ratio understates the win.
    # The filter is on to_date(ts) — a FUNCTION of the column — so the
    # raw scan cannot use parquet row-group stats (no pushdown; it must
    # read every row group of ts/event_type/value), while the pruned
    # scan opens only the in-range directories. Account both from the
    # filesystem.
    def _du(path: str) -> int:
        total = 0
        for root, _, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, fn))
        return total

    rec["full_scan_bytes"] = _du(os.path.join(sf_dir, "events.parquet"))
    rec["pruned_bytes"] = sum(
        _du(os.path.join(lake, d))
        for d in os.listdir(lake)
        if d.startswith("event_date=")
        and EVT_PRUNE_START <= d.split("=")[1] <= EVT_PRUNE_END
    )
    rec["pruned_vs_full_bytes"] = round(
        rec["pruned_bytes"] / rec["full_scan_bytes"], 4
    )
    shutil.rmtree(lake)  # measurement artifact, not an index to keep

    out = os.environ.get("SPARK_GRAFT_LAKE_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
