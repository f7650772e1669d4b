"""Data-profiling / quality-audit operators: referential integrity,
null-and-cardinality profiles, distribution histograms.

The reference trusts PostgreSQL for integrity; a lake-resident engine has
to *check* it — FK orphans appear whenever CDC replays race deletes, and
profile drift is how schema rot is caught at 100 TB. All three operators
are single-pass shapes: audits are anti-join counts, profiles one wide
aggregate, histograms a bucketed count — nothing quadratic, nothing on
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Referential-integrity audit: orphan counts across the FK graph.
# --------------------------------------------------------------------------
@register(
    "audit_fk_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT COUNT(*) FROM lineitem) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)),
           (SELECT COUNT(*) FROM customer)
    """,
)
def audit_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit over the FK graph: each edge is ONE left-anti join
    (shuffle on the key; dim-sized parents broadcast) counting child rows
    with no parent. The query a replication consumer runs after
    cdc_apply_snapshot to prove the rebuilt tables are closed under their
    foreign keys."""
    l = load_table(spark, "lineitem", sf_dir).select("l_orderkey")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey")

    def edge(fk: str, child: DataFrame, parent: DataFrame, ck: str, pk: str):
        # fully lazy: two 1-row aggregates joined (broadcast of single
        # rows), never a driver-side count
        orphans = child.join(parent, child[ck] == parent[pk], "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        total = child.agg(F.count("*").alias("n_rows"))
        return orphans.crossJoin(F.broadcast(total)).select(
            F.lit(fk).alias("fk"), "n_orphans", "n_rows"
        )

    return (
        edge("lineitem->orders", l, o.select("o_orderkey"), "l_orderkey", "o_orderkey")
        .unionByName(edge("orders->customer", o, c.select("c_custkey"), "o_custkey", "c_custkey"))
        .unionByName(edge("customer->nation", c, n, "c_nationkey", "n_nationkey"))
    )


# --------------------------------------------------------------------------
# Column profile: null / distinct / range stats in one wide aggregate.
# --------------------------------------------------------------------------
@register(
    "profile_events_columns",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(user_id) AS user_id_nulls,
           COUNT(DISTINCT user_id) AS user_id_distinct,
           MIN(user_id) AS user_id_min, MAX(user_id) AS user_id_max,
           COUNT(*) - COUNT(event_type) AS event_type_nulls,
           COUNT(DISTINCT event_type) AS event_type_distinct,
           COUNT(*) - COUNT(value) AS value_nulls,
           MIN(value) AS value_min, MAX(value) AS value_max,
           MIN(ts) AS ts_min, MAX(ts) AS ts_max
    FROM events
    """,
)
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df.summary() shape made deterministic and single-pass: one wide
    aggregate row (partial+final, map-side combined) carrying null counts,
    cardinalities and ranges — profile drift between ingestion runs is the
    cheapest schema-rot alarm a pipeline can keep."""
    e = load_table(spark, "events", sf_dir)
    cnt = F.count(F.lit(1))
    return e.agg(
        cnt.alias("n_rows"),
        (cnt - F.count("user_id")).alias("user_id_nulls"),
        F.countDistinct("user_id").alias("user_id_distinct"),
        F.min("user_id").alias("user_id_min"),
        F.max("user_id").alias("user_id_max"),
        (cnt - F.count("event_type")).alias("event_type_nulls"),
        F.countDistinct("event_type").alias("event_type_distinct"),
        (cnt - F.count("value")).alias("value_nulls"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )


# --------------------------------------------------------------------------
# Distribution histogram: fixed-width bins over a numeric column.
# --------------------------------------------------------------------------
_HIST_WIDTH = 5000.0


@register(
    "agg_price_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(l_extendedprice / {_HIST_WIDTH}) AS BIGINT) AS bucket,
           CAST(FLOOR(l_extendedprice / {_HIST_WIDTH}) * {_HIST_WIDTH} AS DOUBLE)
             AS bucket_low,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a bucketed count — integer bucket ids, so
    no float-boundary ambiguity. One hash aggregate; bins are the
    driver-free way to see a 100 TB distribution (vs. collecting samples)."""
    l = load_table(spark, "lineitem", sf_dir)
    bucket = F.floor(F.col("l_extendedprice") / _HIST_WIDTH)
    return (
        l.groupBy(
            bucket.cast("long").alias("bucket"),
            (bucket * _HIST_WIDTH).cast("double").alias("bucket_low"),
        )
        .agg(F.count("*").alias("n"))
    )
