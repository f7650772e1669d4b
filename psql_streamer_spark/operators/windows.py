"""Window functions: ranking, analytic (lag/lead), aggregate frames.

Scale notes: every Window.partitionBy is a shuffle on that key — most
queries partition on high-cardinality keys (custkey/user_id/suppkey), so
they parallelize across executors. The two full-ranking queries order
within LOW-cardinality partitions (c_mktsegment has 5 values; the ntile
demo is a single global ordering), which single-phase windows would sort
on 5 threads / 1 thread no matter how many executors exist — the same
wall class as text_top_ngrams_per_source's 105-s window at sf30. Because
their output is a rank for EVERY row (not top-k), salting doesn't apply;
instead RANK/DENSE_RANK/ROW_NUMBER/NTILE/PERCENT_RANK/CUME_DIST decompose
exactly over order-respecting value buckets of the leading ORDER BY key:
rank within (partition, bucket) + a prefix-sum offset computed on the
per-bucket count summary (|partitions| x |buckets| rows — the only frame
that ever sees a low-cardinality window). Equal key values share a bucket
by construction, so tie groups never straddle buckets and the
decomposition is bit-identical to the single window, ties included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from psql_streamer_spark.functions.numeric import DEC
from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table

# Order-respecting bucket width for the c_acctbal ranking decompositions:
# TPC-H balances span ~[-1000, 10000] uniformly, so width 200 gives ~55
# buckets (x5 segments = ~275 ranking cells). The width is the parallelism
# knob — shrink it on a bigger cluster; for a skewed ORDER BY key, replace
# the fixed width with approx-quantile boundaries (same decomposition,
# data-driven buckets). NULL balances (none in TPC-H, but the decomposition
# must not silently drop them) collapse to a sentinel bucket that sorts
# where Spark's window ordering places NULLs (first under ASC, last under
# DESC — a very negative bucket id does both).
_ACCTBAL_BUCKET_WIDTH = 200.0
_NULL_BUCKET = -(2**31)


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
    """Segment-partitioned RANK/DENSE_RANK + a global NTILE(4), computed
    distributed: the naive form sorts the whole table on |segments| = 5
    threads (and the global ntile on ONE) — see the module docstring.

    Decomposition, bit-identical to the single window: bucket on
    floor(c_acctbal / width) (equal balances share a bucket, so rank tie
    groups never straddle); RANK = rows in earlier buckets + rank within
    bucket; DENSE_RANK = distinct balances in earlier buckets + dense rank
    within bucket; NTILE(4) is a closed form of the global row number
    (earlier-bucket rows + row_number within bucket) and the total count:
    the first n%4 tiles take floor(n/4)+1 rows. Offsets ride prefix sums
    over the per-bucket count summary (5 x ~55 rows), the only frame that
    sees a segment-only window; the 1-row total broadcasts (house
    crossJoin(broadcast) pattern — never collect)."""
    c = load_table(spark, "customer", sf_dir)
    b = c.withColumn(
        "__bkt",
        F.coalesce(
            F.floor(F.col("c_acctbal") / F.lit(_ACCTBAL_BUCKET_WIDTH)).cast("long"),
            F.lit(_NULL_BUCKET),
        ),
    )
    seg_sum = b.groupBy("c_mktsegment", "__bkt").agg(
        F.count("*").alias("__cnt"),
        # distinct FULL order keys per bucket — dense_rank peers are
        # defined by ALL order columns (acctbal, custkey), not the leading
        # one; count_distinct drops tuples with any NULL, so NULL-balance
        # peer groups (one per custkey, since NULL sorts as a single value)
        # are counted explicitly
        (
            F.countDistinct("c_acctbal", "c_custkey")
            + F.countDistinct(
                F.when(F.col("c_acctbal").isNull(), F.col("c_custkey"))
            )
        ).alias("__dcnt"),
    )
    w_seg_pfx = W.partitionBy("c_mktsegment").orderBy(F.desc("__bkt"))
    # offset-frame keys renamed + joined back null-safely: groupBy (and
    # the single-window form this must stay bit-identical to) treat a
    # NULL segment as one group, which a plain equi-join would drop
    seg_off = seg_sum.select(
        F.col("c_mktsegment").alias("__seg_k"),
        F.col("__bkt").alias("__bkt_k"),
        (F.sum("__cnt").over(w_seg_pfx) - F.col("__cnt")).alias("__row_off"),
        (F.sum("__dcnt").over(w_seg_pfx) - F.col("__dcnt")).alias("__dense_off"),
    )
    glob_sum = b.groupBy("__bkt").agg(F.count("*").alias("__gcnt"))
    w_glob_pfx = W.partitionBy(F.lit(0)).orderBy(F.desc("__bkt"))
    glob_off = glob_sum.select(
        F.col("__bkt").alias("__bkt_g"),
        (F.sum("__gcnt").over(w_glob_pfx) - F.col("__gcnt")).alias("__grow_off"),
    )
    total = glob_sum.agg(F.sum("__gcnt").alias("__n"))

    w_in = W.partitionBy("c_mktsegment", "__bkt").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    w_gin = W.partitionBy("__bkt").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    j = (
        b.join(
            F.broadcast(seg_off),
            F.col("c_mktsegment").eqNullSafe(F.col("__seg_k"))
            & (F.col("__bkt") == F.col("__bkt_k")),
        )
        .join(F.broadcast(glob_off), F.col("__bkt") == F.col("__bkt_g"))
        .crossJoin(F.broadcast(total))
        .drop("__seg_k", "__bkt_k", "__bkt_g")
    )
    rn_g = F.col("__grow_off") + F.row_number().over(w_gin)
    n = F.col("__n")
    q = F.floor(n / 4).cast("long")
    r = n % 4
    big = q + F.lit(1)
    cut = r * big
    # greatest(q,1): the otherwise-branch divisor; when q=0, cut = r = n so
    # the branch is never taken, but Spark may still evaluate the expression
    tile = F.when(rn_g <= cut, F.floor((rn_g - 1) / big) + 1).otherwise(
        r + F.floor((rn_g - cut - 1) / F.greatest(q, F.lit(1))) + 1
    )
    return j.select(
        "c_custkey",
        "c_acctbal",
        (F.col("__row_off") + F.rank().over(w_in)).alias("bal_rank"),
        (F.col("__dense_off") + F.dense_rank().over(w_in)).alias("bal_dense_rank"),
        tile.alias("bal_quartile"),
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
    formatted hash.

    Distributed via the same bucket decomposition as the rank query (see
    module docstring): PERCENT_RANK = (rank-1)/(n-1) and CUME_DIST =
    (rank + peers - 1)/n both derive from the bucket-offset RANK, the
    per-segment total, and the peer count (rows sharing the full ORDER BY
    key). The peer window's partition keys extend the in-bucket window's,
    so hashpartitioning(segment, __bkt) satisfies both — one exchange, two
    sorts, |segments| x |buckets| parallelism."""
    c = load_table(spark, "customer", sf_dir)
    b = c.withColumn(
        "__bkt",
        F.coalesce(
            F.floor(F.col("c_acctbal") / F.lit(_ACCTBAL_BUCKET_WIDTH)).cast("long"),
            F.lit(_NULL_BUCKET),
        ),
    )
    seg_sum = b.groupBy("c_mktsegment", "__bkt").agg(F.count("*").alias("__cnt"))
    w_seg_pfx = W.partitionBy("c_mktsegment").orderBy(F.asc("__bkt"))
    # offset/total keys renamed + joined back null-safely (NULL segment is
    # one group in the single-window form — see the rank op)
    seg_off = seg_sum.select(
        F.col("c_mktsegment").alias("__seg_k"),
        F.col("__bkt").alias("__bkt_k"),
        (F.sum("__cnt").over(w_seg_pfx) - F.col("__cnt")).alias("__row_off"),
    )
    seg_tot = seg_sum.groupBy("c_mktsegment").agg(F.sum("__cnt").alias("__n_seg"))
    seg_tot = seg_tot.select(
        F.col("c_mktsegment").alias("__seg_t"), "__n_seg"
    )
    w_in = W.partitionBy("c_mktsegment", "__bkt").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    w_peer = W.partitionBy("c_mktsegment", "__bkt", "c_acctbal", "c_custkey")
    j = (
        b.join(
            F.broadcast(seg_off),
            F.col("c_mktsegment").eqNullSafe(F.col("__seg_k"))
            & (F.col("__bkt") == F.col("__bkt_k")),
        )
        .join(
            F.broadcast(seg_tot),
            F.col("c_mktsegment").eqNullSafe(F.col("__seg_t")),
        )
        .drop("__seg_k", "__bkt_k", "__seg_t")
    )
    rank_g = F.col("__row_off") + F.rank().over(w_in)
    peers = F.count("*").over(w_peer)
    n = F.col("__n_seg")
    pct = F.when(n > 1, (rank_g - F.lit(1)) / (n - F.lit(1))).otherwise(F.lit(0.0))
    cume = (rank_g + peers - F.lit(1)) / n
    return j.select(
        "c_custkey",
        "c_mktsegment",
        F.round(pct, 6).alias("bal_pct_rank"),
        F.round(cume, 6).alias("bal_cume_dist"),
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
