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
