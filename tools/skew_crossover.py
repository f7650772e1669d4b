"""Measure join-skew strategies against each other: straggler baseline
(AQE skew off) vs AQE runtime skew split vs manual salted_join, on a
synthetic hot-key shape (one key owns half the big side) at growing scale.

Writes SKEW_r13.json. Thresholds are production defaults scaled to local
shuffle sizes (16 MiB skew threshold / 8 MiB advisory vs the 256 MiB
default): the local[32] shuffle partitions are ~100x smaller than a
production executor's, so the RATIO of hot partition to threshold is what
is held representative, not the absolute bytes.

Usage: python tools/skew_crossover.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def build(spark, n_big: int, n_keys: int, hot_share: float):
    n_hot = int(n_big * hot_share)
    big = spark.range(n_big).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise((F.col("id") % (n_keys - 1)) + 1)
        .cast("long")
        .alias("k"),
        F.concat(F.lit("payload-padding-"), F.col("id").cast("string")).alias("pay"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k2"), (F.col("id") % 5).alias("grp")
    )
    return big, small


def run_once(spark, big, small, mode: str, buckets: int = 16) -> tuple[float, int, bool]:
    skew_on = mode == "aqe_skew"
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    t0 = time.monotonic()
    if mode == "salted":
        from psql_streamer_spark.operators.asof import salted_join

        joined = salted_join(
            big, small, big_on="k", small_on="k2",
            buckets=buckets, hot_row_threshold=100_000, sample_fraction=0.001,
        )
    else:
        joined = big.join(small, F.col("k") == F.col("k2"))
    agg = joined.groupBy("grp").agg(
        F.count("*").alias("n"), F.max("pay").alias("mp")
    )
    n = sum(r.n for r in agg.collect())
    wall = time.monotonic() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return wall, n, "skew=true" in plan


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SKEW_r13.json"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB"
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n_big in (2_000_000, 8_000_000, 24_000_000):
        big, small = build(spark, n_big, n_keys=50_000, hot_share=0.5)
        row: dict = {"n_big": n_big, "hot_share": 0.5, "n_keys": 50_000}
        for mode in ("plain", "aqe_skew", "salted"):
            walls = []
            for rep in range(2):
                wall, n, skewed = run_once(spark, big, small, mode)
                walls.append(round(wall, 3))
                assert n == n_big, (mode, n)
                if mode == "aqe_skew" and rep == 0:
                    row["aqe_marked_skew"] = skewed
            row[mode + "_sec"] = min(walls)
            row[mode + "_sec_all"] = walls
            print(f"n_big={n_big} {mode}: {walls}", flush=True)
        results.append(row)
    print(json.dumps(results))
    with open(out_path, "w") as f:
        json.dump({"rows": results, "note": __doc__.strip()}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
