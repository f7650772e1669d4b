"""Core relational operators: scan, project/filter, join, aggregate, top-k.

The reference has no relational surface (SURVEY.md §2.8) — this is engine
scope added per the north star, expressed purely with built-in DataFrame
ops so Catalyst handles pushdown/pruning/join-selection.

Scale notes (100 TB / 1000 executors):
- filters are applied before joins so they reach the parquet scan
  (PushedFilters); projections are explicit so ReadSchema stays narrow;
- region/nation are broadcast unconditionally (fixed 5/25 rows at any SF);
  customer-side joins rely on AQE to pick broadcast vs sort-merge by
  runtime stats rather than hard-coding;
- aggregates are partial+final hash aggregates (map-side combine) by
  construction — no distinct-on-top-of-shuffle patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psql_streamer_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Flagship: the CDC batch view — events per type per hour.
# This is the batch form of the reference's hot path (mux batches of events
# fanned out per table/topic, SURVEY.md §3.2): group the event stream by
# its routing key and a processing window, count + aggregate payload.
# --------------------------------------------------------------------------
@register(
    "events_per_type_hour",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sum_value} AS sum_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """.format(sum_value=sql_dsum("value")),
)
def events_per_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q1 shape: multi-aggregate scan with pushed-down date filter.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty} AS sum_qty,
           {sum_base_price} AS sum_base_price,
           {sum_disc_price} AS sum_disc_price,
           {sum_charge} AS sum_charge,
           {avg_qty} AS avg_qty,
           {avg_price} AS avg_price,
           {avg_disc} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=sql_dsum("l_quantity"),
        sum_base_price=sql_dsum("l_extendedprice"),
        sum_disc_price=sql_dsum("l_extendedprice * (1 - l_discount)"),
        sum_charge=sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"),
        avg_qty=sql_davg("l_quantity"),
        avg_price=sql_davg("l_extendedprice"),
        avg_disc=sql_davg("l_discount"),
    ),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: selective filters -> 3-way join -> agg -> top-k.
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           {revenue} AS revenue,
           o.o_orderdate AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """.format(revenue=sql_dsum("l.l_extendedprice * (1 - l.l_discount)")),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    joined = c.join(o, c.c_custkey == o.o_custkey).join(
        l, l.l_orderkey == o.o_orderkey
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        # deterministic top-k: total order via tiebreak columns
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: star join through two broadcast dims + region filter.
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS n_name, {revenue} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n.n_name
    """.format(revenue=sql_dsum("l.l_extendedprice * (1 - l.l_discount)")),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale-first join order: the region filter keeps 1 of 5 regions, so
    # semi-reducing customer AND supplier through the broadcast nation list
    # BEFORE the fact joins cuts the shuffled build sides ~5x — at 100 TB
    # that's the difference between shuffling 20% of customer/supplier and
    # all of it. nation/region are fixed-size (25/5 rows) at every SF ->
    # always broadcast; the big joins stay shuffle joins for AQE to manage.
    asia_nations = F.broadcast(
        load_table(spark, "nation", sf_dir)
        .join(
            F.broadcast(
                load_table(spark, "region", sf_dir).filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    c = load_table(spark, "customer", sf_dir).join(
        asia_nations, F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey")
    s = load_table(spark, "supplier", sf_dir).join(
        asia_nations, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, "lineitem", sf_dir)
    joined = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("n_name").agg(dsum(revenue).alias("revenue"))


# --------------------------------------------------------------------------
# Broadcast dim enrichment (the CDC "route + enrich" shape in batch form).
# --------------------------------------------------------------------------
@register(
    "join_broadcast_enrich",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           {bal} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """.format(bal=sql_dsum("c.c_acctbal")),
)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    r = F.broadcast(load_table(spark, "region", sf_dir))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# --------------------------------------------------------------------------
@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Outer join with null handling.
# --------------------------------------------------------------------------
@register(
    "join_outer_order_counts",
    oracle="""
    SELECT c.c_custkey AS c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE({tot}, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """.format(tot=sql_dsum("o.o_totalprice")),
)
def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# Range/theta join: equi key + band predicate. At scale: the equi key
# carries the shuffle; the band predicate evaluates post-match (no
# cross-product).
# --------------------------------------------------------------------------
@register(
    "join_range_part_quantity_band",
    oracle="""
    SELECT p.p_brand AS p_brand, COUNT(*) AS n_lines,
           {qty} AS sum_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
    GROUP BY p.p_brand
    """.format(qty=sql_dsum("l.l_quantity")),
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    cond = (
        (l.l_partkey == p.p_partkey)
        & (l.l_quantity >= p.p_size - 5)
        & (l.l_quantity <= p.p_size + 5)
    )
    return (
        l.join(p, cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
    )


# --------------------------------------------------------------------------
# Distinct aggregates (exact + grouped).
# --------------------------------------------------------------------------
@register(
    "agg_distinct_counts",
    oracle="""
    SELECT c.c_mktsegment AS c_mktsegment,
           COUNT(DISTINCT o.o_custkey) AS n_buyers,
           COUNT(DISTINCT o.o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Rollup / cube (multi-level aggregates in one pass).
# --------------------------------------------------------------------------
@register(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    r = F.broadcast(load_table(spark, "region", sf_dir))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .rollup("region_name", "nation_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "agg_cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {qty} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """.format(qty=sql_dsum("l_quantity")),
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "agg_grouping_sets_line_flags",
    oracle="""
    SELECT l_linenumber, l_returnflag, COUNT(*) AS n, {qty} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_linenumber), (l_returnflag),
                            (l_linenumber, l_returnflag))
    """.format(qty=sql_dsum("l_quantity")),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube). One
    scan, one Expand node, one shuffle — vs three unioned aggregations."""
    l = load_table(spark, "lineitem", sf_dir)
    l.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_linenumber, l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sum_qty
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_linenumber), (l_returnflag),
                                (l_linenumber, l_returnflag))
        """
    )


# --------------------------------------------------------------------------
# Sort / limit / global top-k. Deterministic via total order.
# --------------------------------------------------------------------------
@register(
    "topk_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           {rev} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """.format(rev=sql_dsum("o.o_totalprice")),
)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )
