"""Window functions: ranking, analytic (lag/lead), aggregate frames.

Scale notes: every Window.partitionBy is a shuffle on that key — these
queries partition on high-cardinality keys (custkey/user_id/suppkey), so
they parallelize across executors; no global (unpartitioned) windows in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from psql_streamer_spark.functions.numeric import DEC
from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


# Running totals need an exact (order-independent-per-prefix) sum too:
# both engines accumulate in frame order, but double addition is exact only
# through decimal; we cast per-element and cast the running total back.
@register(
    "window_running_order_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           RANK()       OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           NTILE(4)     OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wg = W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(wg).alias("bal_quartile"),
    )


@register(
    "window_percent_rank_cume_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS bal_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics (percentile of each customer's balance
    within its segment). Rounded to 6 places on BOTH sides: the division
    (rank-1)/(n-1) is IEEE-identical cross-engine, rounding just pins the
    formatted hash. Same single-shuffle window shape as the rank query."""
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


@register(
    "window_lag_lead_user_events",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           CAST(date_diff('second', LAG(ts) OVER w, ts) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .cast("long")
        .alias("secs_since_prev"),
    )


@register(
    "window_moving_avg_supplier",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_suppkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           AS moving_avg_price
    FROM lineitem
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    # ROWS frames demand a TOTAL order: (orderkey, linenumber) repeats in
    # the synthetic lineitem, so l_partkey completes the unique key —
    # without it, tie order differs across engines (and across Spark runs)
    # and every 5-row frame crossing a tie averages different members
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(-4, W.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        (
            F.sum(F.col("l_extendedprice").cast(DEC)).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg_price"),
    )


@register(
    "window_first_last_nth_order",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING) AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value — last/nth need the full-partition frame
    (default frame stops at CURRENT ROW, a classic silent-wrong-answer);
    ordering includes the key so ties can't differ across engines."""
    o = load_table(spark, "orders", sf_dir)
    w_default = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_default.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w_default).alias("first_ok"),
        F.last("o_orderkey").over(w_full).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_ok"),
    )


@register(
    "window_forward_fill_gaps",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 3 = 0 THEN value END AS v
      FROM events
    )
    SELECT event_id, user_id, ts,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM sparse
    """,
)
def window_forward_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (gap fill): carry the last observed value forward
    within each user's timeline — IGNORE NULLS value-window semantics,
    the time-series imputation every metrics pipeline runs. The sparse
    column is manufactured (every 3rd event observed) so the fill path
    is actually exercised; rows before a user's first observation stay
    NULL in both engines. One window shuffle on user_id."""
    e = load_table(spark, "events", sf_dir)
    v = F.when(F.col("event_id") % 3 == 0, F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )
