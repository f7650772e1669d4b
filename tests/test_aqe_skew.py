"""AQE skew-join guard: Spark's runtime skew handling must engage on the
same hot-key shape the manual salted_join tier exists for — and produce
identical results. This is the plan-level proof that at scale we have TWO
working answers to join skew (declarative AQE split + explicit salting),
with the crossover measured in SKEW_r13.json / BENCH_NOTES.md."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_AQE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # test-scale thresholds: the defaults (256 MiB partitions) are sized
    # for production shuffles; the MECHANISM is what we pin here
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


@pytest.fixture()
def aqe_session(spark):
    old = {k: spark.conf.get(k, None) for k in _AQE_CONFS}
    for k, v in _AQE_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_frames(spark, n_big=200_000, n_keys=5_000, hot_share=0.5):
    """Big side where one key owns hot_share of all rows — the shape that
    stalls an unsalted shuffle join on one straggler task."""
    n_hot = int(n_big * hot_share)
    big = spark.range(n_big).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise((F.col("id") % (n_keys - 1)) + 1)
        .cast("long")
        .alias("k"),
        F.concat(F.lit("payload-padding-"), F.col("id").cast("string")).alias(
            "pay"
        ),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )
    return big, small


def test_aqe_splits_the_skewed_partition(aqe_session):
    spark = aqe_session
    big, small = _skewed_frames(spark)
    # max(pay) keeps the payload column through the join (column pruning
    # would otherwise shrink the big side under the skew byte threshold)
    joined = (
        big.join(small, "k")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.max("pay").alias("mp"))
    )
    rows = {r.grp: r.n for r in joined.collect()}  # execute -> final plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, (
        "AQE did not mark the hot partition as skewed — thresholds or "
        "skew shape regressed:\n" + plan[:2000]
    )
    # and the runtime split must not change the answer (computed in
    # plain Python from the same generator arithmetic)
    n_big, n_keys, n_hot = 200_000, 5_000, 100_000
    want: dict[int, int] = {}
    for i in range(n_big):
        k = 0 if i < n_hot else (i % (n_keys - 1)) + 1
        want[k % 5] = want.get(k % 5, 0) + 1
    assert rows == want
    assert sum(rows.values()) == n_big


def test_salted_join_matches_aqe_result_on_the_same_shape(aqe_session):
    from psql_streamer_spark.operators.asof import salted_join

    spark = aqe_session
    big, small = _skewed_frames(spark, n_big=50_000, n_keys=1_000)
    plain = {
        r.grp: r.n
        for r in big.join(small, "k")
        .groupBy("grp")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    small = small.withColumnRenamed("k", "k2")
    salted = salted_join(
        big,
        small,
        big_on="k",
        small_on="k2",
        buckets=8,
        hot_row_threshold=5_000,
        sample_fraction=0.01,
    )
    got = {
        r.grp: r.n
        for r in salted.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert got == plain
