"""Extended relational surface: exact percentiles, pivot/unpivot, and
correlated-subquery shapes (engine scope per SURVEY §2.8 — the reference
has no relational operators at all).

Determinism notes:
- percentile_disc picks an actual element (no interpolation arithmetic),
  so it is bit-exact cross-engine where percentile_cont would drift.
- the q17-style scalar-subquery filter is rewritten to integer arithmetic
  (qty * cnt * 5 < sum_qty) — algebraically identical to
  qty < 0.2 * avg(qty) but with no division, hence no float rounding.
- pivot cells and unpivot values go through the decimal-sum helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from psql_streamer_spark.functions.numeric import dsum, sql_dsum
from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Exact percentiles (percentile_disc = element selection, hash-stable).
# --------------------------------------------------------------------------
@register(
    "agg_percentile_price_bands",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS p25,
           quantile_disc(l_extendedprice, 0.50) AS p50,
           quantile_disc(l_extendedprice, 0.75) AS p75,
           quantile_disc(l_extendedprice, 0.95) AS p95,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles per return flag. A full-sort-per-group under
    the hood; at scale this is one shuffle on the group key with the
    per-partition sort spilling — same shape as any ordered aggregate."""
    l = load_table(spark, "lineitem", sf_dir)
    pd_ = lambda p: F.expr(  # noqa: E731
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY l_extendedprice)"
    )
    return l.groupBy("l_returnflag").agg(
        pd_(0.25).alias("p25"),
        pd_(0.50).alias("p50"),
        pd_(0.75).alias("p75"),
        pd_(0.95).alias("p95"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Pivot: nation x order-priority revenue matrix.
# --------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_pivot_cells_sql = ",\n           ".join(
    sql_dsum(f"CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END")
    + f' AS "{p}"'
    for p in _PRIORITIES
)


@register(
    "pivot_nation_priority_revenue",
    oracle=f"""
    SELECT n_name,
           {_pivot_cells_sql}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def pivot_nation_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with EXPLICIT pivot values: without the value list
    Spark runs an extra distinct job to discover them — at scale the values
    are known (closed enums), so the scan happens once. Dimension joins
    broadcast."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    joined = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )
    return (
        joined.groupBy("n_name")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(dsum("o_totalprice"))
    )


# --------------------------------------------------------------------------
# Unpivot: wide part metrics -> long (metric, value) rows.
# --------------------------------------------------------------------------
@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt — a narrow per-row explode (no shuffle); values share
    one type (double) per the operator's contract."""
    p = load_table(spark, "part", sf_dir).select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H q17 shape), division-free.
# --------------------------------------------------------------------------
@register(
    "join_scalar_subquery_small_qty",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small_lines,
           {total} AS total_price
    FROM lineitem JOIN per_part ON l_partkey = pk
    WHERE CAST(l_quantity AS BIGINT) * cnt * 5 < sum_qty
    """.format(total=sql_dsum("l_extendedprice")),
)
def join_scalar_subquery_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: lines with quantity below 20% of their part's average.
    The correlated scalar subquery decorrelates into a per-part aggregate
    joined back on the key — ONE shuffle each side on l_partkey (AQE can
    convert to broadcast if the agg side is small). The 0.2*avg threshold
    is integer-rewritten (qty*cnt*5 < sum_qty): exact, division-free."""
    l = load_table(spark, "lineitem", sf_dir)
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    small = l.join(per_part, l["l_partkey"] == per_part["pk"]).filter(
        F.col("l_quantity").cast("bigint") * F.col("cnt") * 5 < F.col("sum_qty")
    )
    return small.agg(
        F.count("*").alias("n_small_lines"),
        dsum("l_extendedprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Ordered string aggregation (listagg semantics, deterministically sorted).
# --------------------------------------------------------------------------
@register(
    "agg_listagg_top_customers",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS names,
           COUNT(*) AS n
    FROM customer
    WHERE c_custkey <= 100
    GROUP BY c_mktsegment
    """,
)
def agg_listagg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg with a deterministic order: collect_list order is partition-
    dependent, so the list is array_sort()ed before joining — the only
    hash-stable way to string-aggregate in a distributed engine."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") <= 100)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# TPC-H q7 shape: disjunctive two-nation join condition.
# --------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, {rev} AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
          OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 23:59:59'
    )
    GROUP BY 1, 2, 3
    """.format(rev=sql_dsum("volume")),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7: trade volume between two nations by year. The disjunctive
    nation-pair predicate lands on broadcast dims; supplier and customer
    are nation-filtered BEFORE touching the fact joins (same semi-reduce
    discipline as q5), so the big shuffles carry only the two nations'
    rows."""
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31 23:59:59")
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    pair = n.filter(F.col("n_name").isin("FRANCE", "GERMANY"))
    s = (
        load_table(spark, "supplier", sf_dir)
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    joined = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY"))
            | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume").alias("revenue"), F.count("*").alias("n_lines"))
    )


# --------------------------------------------------------------------------
# TPC-H q10 shape: returned-item reporting, top 20 by revenue.
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, {rev} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10: customers who returned the most revenue in a quarter. Both
    selective predicates (order date, return flag) reach their scans as
    pushed filters; the top-20 compiles to TakeOrdered (tie-broken by
    custkey so the limit boundary is deterministic cross-engine)."""
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1993-10-01") & (F.col("o_orderdate") < "1994-01-01")
    )
    l = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name", revenue.alias("rev"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum("rev").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Approximate percentile sketch, contract-checked against the exact value.
# --------------------------------------------------------------------------
@register(
    "agg_approx_percentile_price",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5) AS exact_p50,
           TRUE AS approx_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable percentile sketch (Greenwald-Khanna in Spark). Sketch
    outputs differ across engines by construction, so — like the HLL
    check — the oracle verifies the CONTRACT: the approximation lands
    within 2% of the exact median, and both engines emit the exact value.
    At 100 TB the sketch is the only shuffle-sane percentile: fixed-size
    partial state, map-side combined; the exact form sorts every group."""
    l = load_table(spark, "lineitem", sf_dir)
    exact = F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
    approx = F.percentile_approx("l_extendedprice", 0.5, 10000).cast("double")
    return l.groupBy("l_returnflag").agg(
        exact.alias("exact_p50"),
        (F.abs(approx - exact) / exact < 0.02).alias("approx_within_2pct"),
    )


# --------------------------------------------------------------------------
# Time-range window frame: trailing 90-day revenue per customer.
# --------------------------------------------------------------------------
@register(
    "window_range_frame_trailing_90d",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_90d_revenue
    FROM orders
    """,
)
def window_range_frame_trailing_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (not ROWS): every order sees the sum of
    its customer's orders in the trailing 90 days — the standard trailing-
    metric shape. Spark range frames are numeric, so time is ordered by
    epoch seconds with the frame in seconds; same interval arithmetic as
    the oracle's INTERVAL frame because order dates are midnight-aligned."""
    from pyspark.sql import Window as W

    o = load_table(spark, "orders", sf_dir)
    # NTZ -> (UTC session) timestamp -> epoch seconds: range frames need a
    # numeric ordering column
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(38,8)"))
        .over(w)
        .cast("double")
        .alias("trailing_90d_revenue"),
    )


# --------------------------------------------------------------------------
# Synthetic range source (generate_series scan).
# --------------------------------------------------------------------------
@register(
    "scan_range_synthetic",
    oracle="""
    SELECT CAST(range AS BIGINT) AS id,
           CAST(range AS BIGINT) % 7 AS bucket,
           CAST(range AS BIGINT) * 3 + 1 AS derived
    FROM range(0, 10000)
    """,
)
def scan_range_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.range: the zero-IO synthetic source (backfill drivers, key
    enumeration, dimension seeding). Partitioned generation — numSlices
    splits the range across tasks, so a trillion-row seed is still
    parallel and never materializes on the driver."""
    return spark.range(0, 10000).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        (F.col("id") * 3 + 1).alias("derived"),
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE) — per-customer order-chain walk.
# --------------------------------------------------------------------------
@register(
    "recursive_order_chains",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders WHERE o_custkey <= 200
      ) WHERE rn <= 8
    ),
    chain(o_custkey, o_orderkey, rn, depth) AS (
      SELECT o_custkey, o_orderkey, rn, 1 FROM base WHERE rn = 1
      UNION ALL
      SELECT b.o_custkey, b.o_orderkey, b.rn, c.depth + 1
      FROM chain c JOIN base b
        ON b.o_custkey = c.o_custkey AND b.rn = c.rn + 1
      WHERE c.depth < 12
    )
    SELECT o_custkey, CAST(MAX(depth) AS INT) AS chain_len,
           COUNT(*) AS n_links,
           MAX(o_orderkey) AS last_orderkey
    FROM chain GROUP BY o_custkey
    """,
)
def recursive_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through Spark's SQL front door (4.x): walk each
    customer's order sequence link by link. The recursion is ACYCLIC by
    construction (rn -> rn+1) because Spark's recursive CTEs support only
    UNION ALL — cyclic reachability (e.g. dedup clustering) does not
    terminate under UNION ALL, which is exactly why the clustering
    operator uses the iterative-DataFrame fixpoint (connected_components)
    instead; this query covers the recursion machinery itself. Chains are
    capped at 8 links (identically in both engines): recursion rounds =
    max chain depth, and each round is a separately scheduled join, so
    the bound is what keeps the demo cheap on a vanilla session."""
    for t in ("orders",):
        load_table(spark, t, sf_dir).createOrReplaceTempView(f"rec_{t}")
    return spark.sql("""
      WITH RECURSIVE base AS (
        SELECT * FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM rec_orders WHERE o_custkey <= 200
        ) WHERE rn <= 8
      ),
      chain(o_custkey, o_orderkey, rn, depth) AS (
        SELECT o_custkey, o_orderkey, rn, 1 FROM base WHERE rn = 1
        UNION ALL
        SELECT b.o_custkey, b.o_orderkey, b.rn, c.depth + 1
        FROM chain c JOIN base b
          ON b.o_custkey = c.o_custkey AND b.rn = c.rn + 1
        WHERE c.depth < 12
      )
      SELECT o_custkey, CAST(MAX(depth) AS INT) AS chain_len,
             COUNT(*) AS n_links,
             MAX(o_orderkey) AS last_orderkey
      FROM chain GROUP BY o_custkey
    """)


# --------------------------------------------------------------------------
# Pure-SQL front door: the same engine through spark.sql over views.
# --------------------------------------------------------------------------
@register(
    "sql_api_revenue_by_region",
    oracle="""
    SELECT r_name,
           {rev} AS revenue,
           COUNT(DISTINCT c_custkey) AS n_customers
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    GROUP BY r_name
    """.format(rev=sql_dsum("o_totalprice")),
)
def sql_api_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL API end to end: tables registered as temp views, the query
    written as ANSI SQL, Catalyst planning identical to the DataFrame
    form (same broadcast dims, same partial aggregates) — a user can run
    the whole engine through spark.sql alone."""
    for t in ("region", "nation", "customer", "orders"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(f"sqlv_{t}")
    return spark.sql("""
      SELECT r_name,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,8))), 2) AS DOUBLE)
               AS revenue,
             COUNT(DISTINCT c_custkey) AS n_customers
      FROM sqlv_region
      JOIN sqlv_nation ON n_regionkey = r_regionkey
      JOIN sqlv_customer ON c_nationkey = n_nationkey
      JOIN sqlv_orders ON o_custkey = c_custkey
      GROUP BY r_name
    """)


# --------------------------------------------------------------------------
# Boolean aggregates.
# --------------------------------------------------------------------------
@register(
    "agg_bool_flags_per_order",
    oracle="""
    SELECT l_orderkey,
           bool_and(l_quantity >= 5) AS all_qty_5plus,
           bool_or(l_returnflag = 'R') AS any_returned,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
             AS n_discounted
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def agg_bool_flags_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """every()/some() boolean aggregates plus a filtered count — the
    predicate-rollup shape of data-quality rules ('all lines conforming',
    'any line flagged')."""
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy("l_orderkey").agg(
        F.every(F.col("l_quantity") >= 5).alias("all_qty_5plus"),
        F.some(F.col("l_returnflag") == "R").alias("any_returned"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    )


# --------------------------------------------------------------------------
# GROUPING() disambiguation for rollup NULLs.
# --------------------------------------------------------------------------
@register(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderpriority, '<total>') AS priority,
           CAST(GROUPING(o_orderpriority) AS INT) AS is_total_row,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderpriority)
    """,
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() marks subtotal rows explicitly — the only correct way to
    tell a rollup's total row from a genuine NULL group value (COALESCE
    alone would conflate them if the column were nullable)."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderpriority")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("is_total_row"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("<total>")).alias("priority"),
            "is_total_row",
            "n_orders",
        )
    )


# --------------------------------------------------------------------------
# Correlated EXISTS through the SQL front door.
# --------------------------------------------------------------------------
@register(
    "sql_exists_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice > 300000)
    """,
)
def sql_exists_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS in SQL form: Catalyst decorrelates
    both into left-semi and left-anti joins — same physical plan the
    DataFrame semi/anti operators produce, proving subquery planning is
    covered end to end."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("ex_customer")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("ex_orders")
    return spark.sql("""
      SELECT c_custkey, c_mktsegment
      FROM ex_customer c
      WHERE EXISTS (SELECT 1 FROM ex_orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM ex_orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderstatus = 'F'
                          AND o2.o_totalprice > 300000)
    """)


@register(
    "join_null_safe_priority_match",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    b AS (
      SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT a.prio AS prio,
           COUNT(*) AS n_pairs,
           COUNT(*) FILTER (WHERE a.prio IS NULL) AS n_null_key_pairs
    FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
                 AND a.o_orderkey < b.o_orderkey
    GROUP BY a.prio
    """,
)
def join_null_safe_priority_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) pair counts,
    UNBOUNDED original semantics: NULL keys match EACH OTHER instead of
    vanishing — the semantic a plain equi-join silently drops. NULLIF
    manufactures a null-bearing key from o_orderpriority so the
    null-match path is actually exercised; the aggregate reports how many
    joined pairs rode the null key.

    Scale shape: o_orderpriority has ~5 distinct values, so MATERIALIZING
    the join's pairs is O(|A_p| * |B_p|) per key — quadratic in data size
    no matter the join strategy (the r5 sf1 sweep measured 204 s for 5
    output rows). But the query only ASKS for pair counts, and those are
    order statistics: for each a-row, pairs = |{b in B_prio : kb > ka}|.
    Computed analytically, never materializing a pair:
      1. rows bucket by key range (bkt = k >> 13, ~8k keys/bucket);
      2. per (prio, bkt): a windowed cumsum ordered by (k, b-before-a)
         gives each a-row its within-bucket count of b-keys <= ka —
         partitions are bounded by the bucket width, fully parallel;
      3. per-bucket b-totals (a frame 8192x smaller than the data) take
         one tiny suffix-sum window per prio for the cross-bucket count
         (recursable if N/8192 ever outgrows a reducer);
      4. pairs(a-row) = (bucket_b_total - cum_b<=ka) + suffix_b, summed
         per prio.
    Total O(N log N) sort work within bounded partitions, output 5 rows;
    the null-safe semantics themselves ride the eqNullSafe bucket-stats
    join (step 4), which Spark hash-partitions with NULL as a value.
    The r5 bounded-top-100 rewrite verified a different, cheaper query;
    this restores the original workload (same oracle as r1-r4) at the
    analytic cost. The bounded variant survives honestly renamed below."""
    o = load_table(spark, "orders", sf_dir)
    prio = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    a = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        prio.alias("prio"),
        F.lit(0).alias("is_b"),
    )
    b = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        prio.alias("prio"),
        F.lit(1).alias("is_b"),
    )
    u = a.unionByName(b).withColumn("bkt", F.shiftright(F.col("k"), 13))
    # per-(prio, bucket) b totals + suffix sums over LATER buckets: the
    # stats frame is ~N/8192 rows, so the per-prio window is 4 orders
    # smaller than a whole-priority window over the data would be
    bstats = u.groupBy("prio", "bkt").agg(F.sum("is_b").alias("nb"))
    w_suffix = (
        W.partitionBy("prio").orderBy(F.desc("bkt"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    bstats = bstats.select(
        F.col("prio").alias("sprio"),
        F.col("bkt").alias("sbkt"),
        "nb",
        F.coalesce(F.sum("nb").over(w_suffix), F.lit(0)).alias("suffix_b"),
    )
    # within-bucket cumulative b count; b-rows sort before a-rows on key
    # ties so an a-row's cumsum counts exactly the b-keys <= its own
    # (the join predicate is STRICTLY ka < kb)
    w_cum = (
        W.partitionBy("prio", "bkt").orderBy(F.asc("k"), F.desc("is_b"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pairs_per_a = (
        u.withColumn("cum_b", F.sum("is_b").over(w_cum))
        .filter(F.col("is_b") == 0)
        .join(
            bstats,
            F.col("prio").eqNullSafe(F.col("sprio"))
            & (F.col("bkt") == F.col("sbkt")),
        )
        .withColumn("pairs", F.col("nb") - F.col("cum_b") + F.col("suffix_b"))
    )
    return (
        pairs_per_a.groupBy("prio")
        .agg(
            F.sum("pairs").cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("prio").isNull(), F.col("pairs")).otherwise(0))
            .cast("bigint")
            .alias("n_null_key_pairs"),
        )
        # the oracle's inner join emits no row for a priority with zero
        # pairs; the analytic aggregate must drop those groups too
        .filter(F.col("n_pairs") > 0)
    )


@register(
    "join_null_safe_top100_broadcast",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio
      FROM orders WHERE o_orderkey % 7 = 0
      QUALIFY row_number() OVER (PARTITION BY prio ORDER BY o_orderkey) <= 100
    ),
    b AS (
      SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT a.prio AS prio,
           COUNT(*) AS n_pairs,
           COUNT(*) FILTER (WHERE a.prio IS NULL) AS n_null_key_pairs
    FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
                 AND a.o_orderkey < b.o_orderkey
    GROUP BY a.prio
    """,
)
def join_null_safe_top100_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICITLY BOUNDED null-safe join variant: side A is first cut to a
    deterministic top-100 orderkeys per priority, so this verifies a
    DIFFERENT (drastically cheaper) query than the unbounded
    join_null_safe_priority_match above — the n_pairs values are not
    comparable between the two. What this op demonstrates is the
    bounded-build-side pattern: a SALTED two-phase top-k (per-salt
    row_number first — 32-way parallel — then the exact row_number over
    the <=3200 survivors) so no single reducer ever sees a whole
    priority's rows, after which the bounded side broadcasts at any
    corpus scale and the null-safe theta join's output is O(100 * |B|) —
    linear. The QUALIFY clause in the oracle applies the same bound."""
    o = load_table(spark, "orders", sf_dir)
    clerk = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    a0 = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("ka"), clerk.alias("ca")
    )
    # phase 1: top-100 per (priority, salt) — parallel across 32 salts
    salt = F.pmod(F.xxhash64(F.col("ka")), F.lit(32))
    w_salted = W.partitionBy("ca", "salt").orderBy("ka")
    pre = (
        a0.withColumn("salt", salt)
        .withColumn("rn", F.row_number().over(w_salted))
        .filter(F.col("rn") <= 100)
        .drop("rn", "salt")
    )
    # phase 2: exact top-100 per priority over the bounded survivor set
    w_exact = W.partitionBy("ca").orderBy("ka")
    a = (
        pre.withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") <= 100)
        .drop("rn")
    )
    b = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").alias("kb"), clerk.alias("cb")
    )
    return (
        b.join(
            F.broadcast(a),
            F.col("ca").eqNullSafe(F.col("cb")) & (F.col("ka") < F.col("kb")),
        )
        .groupBy(F.col("ca").alias("prio"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.count(F.when(F.col("ca").isNull(), 1)).alias("n_null_key_pairs"),
        )
    )


# --------------------------------------------------------------------------
# Time-window correlation join, bin-bucketed. "For each error, how many
# events did that user produce in the preceding 5 minutes" is an interval
# self-join — written naively (t BETWEEN e.t - 5m AND e.t) Spark plans a
# theta join: every user's errors x every user's events on one reducer.
# The scale form bins time into window-sized buckets and equi-joins on
# (user, bin) for the candidate bin pair {bin(t), bin(t)-1} — candidates
# shrink from |user's events| to two buckets' worth, the exact range
# predicate filters inside the equi-join, and the whole thing shuffles
# once on (user_id, bin). Same trick as the LSH banding: coarse equality
# first, exact predicate second.
# --------------------------------------------------------------------------
CORR_WINDOW_MIN = 5


@register(
    "join_time_window_correlation",
    oracle=f"""
    SELECT e.event_id AS error_id,
           e.user_id AS user_id,
           COUNT(p.event_id) AS n_preceding
    FROM events e
    LEFT JOIN events p
      ON p.user_id = e.user_id
     AND p.event_id <> e.event_id
     AND p.ts <= e.ts
     AND p.ts >= e.ts - INTERVAL {CORR_WINDOW_MIN} MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
)
def join_time_window_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preceding-activity count per error event via the binned interval
    join. Errors land in bin(ts); candidate partners live in bin(ts) or
    bin(ts)-1 (window <= bin width), so the error side explodes to two
    (user, bin) probe keys, the join is a plain equi-join on them, and
    the exact [ts-5m, ts] predicate prunes inside. Left join semantics
    (errors with no preceding activity keep count 0) are preserved by
    re-counting per error id over the candidate matches."""
    e = load_table(spark, "events", sf_dir)
    bin_us = CORR_WINDOW_MIN * 60
    ebin = (F.unix_timestamp("ts") / bin_us).cast("bigint")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("ets"),
        ebin.alias("bin"),
    )
    probes = errors.select(
        "error_id",
        "user_id",
        "ets",
        F.explode(F.array(F.col("bin"), F.col("bin") - 1)).alias("pbin"),
    )
    partners = e.select(
        F.col("user_id"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        ebin.alias("pbin"),
    )
    matched = probes.join(partners, ["user_id", "pbin"]).filter(
        (F.col("pid") != F.col("error_id"))
        & (F.col("pts") <= F.col("ets"))
        & (F.col("pts") >= F.col("ets") - F.expr(f"INTERVAL {CORR_WINDOW_MIN} MINUTES"))
    )
    counts = matched.groupBy("error_id").agg(F.count("*").alias("n_preceding"))
    return (
        errors.select("error_id", "user_id")
        .join(counts, "error_id", "left")
        .select(
            "error_id",
            "user_id",
            F.coalesce("n_preceding", F.lit(0)).alias("n_preceding"),
        )
    )


@register(
    "agg_bitwise_flags",
    oracle="""
    SELECT event_type,
           BIT_AND(CAST(event_id % 256 AS BIGINT)) AS all_bits,
           BIT_OR(CAST(event_id % 256 AS BIGINT)) AS any_bits,
           BIT_XOR(CAST(event_id % 256 AS BIGINT)) AS parity_bits
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR) over a manufactured 8-bit flag
    field — the permission-mask / feature-flag rollup shape. All three
    are commutative-associative, so they partial-aggregate map-side like
    any sum; integers are exact, no FP caveats."""
    e = load_table(spark, "events", sf_dir)
    flags = (F.col("event_id") % 256).cast("bigint")
    return e.groupBy("event_type").agg(
        F.bit_and(flags).alias("all_bits"),
        F.bit_or(flags).alias("any_bits"),
        F.bit_xor(flags).alias("parity_bits"),
    )
