"""Set operations: union / intersect / except / distinct.

Scale notes: INTERSECT/EXCEPT compile to shuffle joins on the full row —
fine on deduplicated key sets (as used here: user_id projections), wrong
on wide rows. UNION is shuffle-free (plan concatenation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


def _users_of(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    return (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type") == event_type)
        .select("user_id")
        .distinct()
    )


@register(
    "setop_union_active_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _users_of(spark, sf_dir, "purchase").union(
        _users_of(spark, sf_dir, "signup")
    ).distinct()


@register(
    "setop_intersect_buyers_who_erred",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _users_of(spark, sf_dir, "purchase").intersect(
        _users_of(spark, sf_dir, "error")
    )


@register(
    "setop_except_browsers_never_bought",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _users_of(spark, sf_dir, "view").exceptAll(
        _users_of(spark, sf_dir, "purchase")
    )


@register(
    "setop_union_all_counts",
    oracle="""
    SELECT kind, COUNT(*) AS n FROM (
      SELECT 'purchase' AS kind, user_id FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT 'signup' AS kind, user_id FROM events WHERE event_type = 'signup'
    ) GROUP BY kind
    """,
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("kind"), "user_id"
    )
    s = e.filter(F.col("event_type") == "signup").select(
        F.lit("signup").alias("kind"), "user_id"
    )
    return p.unionByName(s).groupBy("kind").agg(F.count("*").alias("n"))


@register(
    "setop_intersect_all_multiset",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_quantity >= 10
    """,
)
def setop_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each orderkey appears min(m, n)
    times — the multiset form neither DISTINCT-intersect nor a semi-join
    can express. Compiles to a count-compare aggregate join, one shuffle
    per side."""
    l = load_table(spark, "lineitem", sf_dir)
    a = l.filter(F.col("l_linenumber") <= 2).select("l_orderkey")
    b = l.filter(F.col("l_quantity") >= 10).select("l_orderkey")
    return a.intersectAll(b)


@register(
    "setop_except_all_multiset",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_quantity >= 10
    """,
)
def setop_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: each orderkey survives max(m - n, 0) times (bag
    difference) — the replay-accounting primitive: 'events delivered more
    times than acknowledged'."""
    l = load_table(spark, "lineitem", sf_dir)
    a = l.filter(F.col("l_linenumber") <= 2).select("l_orderkey")
    b = l.filter(F.col("l_quantity") >= 10).select("l_orderkey")
    return a.exceptAll(b)
