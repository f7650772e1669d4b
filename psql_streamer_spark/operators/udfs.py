"""The Python UDF/UDAF/UDTF surface (SURVEY.md §2.8 last row).

The reference's only extension point is the eventHandler chain
(sink/kafka/kafka.go:20-23) — a per-event Go callback. Spark's equivalents,
demonstrated here with oracle-checked queries:

  applyInPandas        grouped transform (normalize-per-group example)
  pandas_udf GROUPED_AGG  custom aggregate over Arrow batches
  pandas_udf (scalar)  vectorized row transform
  Python UDTF          one-row-in, N-rows-out lateral expansion

All of these are the SLOW path relative to built-in expressions — Arrow
batching makes them ~10-100x faster than row-at-a-time Python UDFs, but
they still leave WholeStageCodegen. The engine's rule: built-ins first
(see transforms.py/scalar.py), this surface only for logic expressions
can't say.

Determinism note: every numeric result below is reachable from the inputs
by IEEE ops alone (min/max selection, subtraction, division) — no
order-dependent float summation — so pandas (float64) and DuckDB produce
bit-identical doubles and the value-hash comparison is exact, no rounding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# applyInPandas: normalize-per-group (grouped map over Arrow batches).
# --------------------------------------------------------------------------
_NORM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("norm_value", DoubleType()),
    ]
)


@register(
    "udf_minmax_normalize_per_group",
    oracle="""
    SELECT event_id, event_type, value,
           (value - MIN(value) OVER w) / (MAX(value) OVER w - MIN(value) OVER w)
             AS norm_value
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_minmax_normalize_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization via applyInPandas — each group
    arrives as one pandas DataFrame (Arrow transfer), is transformed in
    vectorized numpy, and returns with the same grouping guarantee a
    shuffle-on-key gives. Scale: state is one group per task at a time and
    event_type has a HANDFUL of values, so this is the declared
    demonstration tier of the grouped-map API — at corpus scale one task
    would hold ~corpus/|types| rows. The production tier is
    `udf_minmax_normalize_broadcast_stats` below: same result, aggregate
    state reduced map-side and broadcast back, no group materialization.
    Degenerate-group edge (absent from the data, test-pinned): an
    all-equal group is numpy 0/0 = NaN in the pandas frame, which the
    Arrow return path surfaces as NULL (NaN is pandas' null sentinel) —
    agreeing with the oracle's and the production tier's zero-divisor
    NULL, so all three tiers match even here."""

    def normalize(pdf):
        lo, hi = pdf["value"].min(), pdf["value"].max()
        pdf = pdf[["event_id", "event_type", "value"]].copy()
        pdf["norm_value"] = (pdf["value"] - lo) / (hi - lo)
        return pdf

    e = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    return e.groupBy("event_type").applyInPandas(normalize, _NORM_SCHEMA)


@register(
    "udf_minmax_normalize_broadcast_stats",
    oracle="""
    SELECT event_id, event_type, value,
           (value - MIN(value) OVER w) / (MAX(value) OVER w - MIN(value) OVER w)
             AS norm_value
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_minmax_normalize_broadcast_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production tier of the grouped-map demo above. event_type has a
    handful of values, so `groupBy(type).applyInPandas` materializes
    ~corpus/|types| rows as ONE pandas frame in one task — an OOM wall at
    100 TB regardless of executor count (the demo op's docstring names
    this; this op IS the named mitigation). When the per-group state a
    grouped map needs is an aggregate (here: min, max), reduce it with
    map-side-combined built-ins, broadcast the |types|-row stats frame
    back, and apply the transform as a JVM expression — zero Python, zero
    group materialization, no shuffle of the big side at all. Same IEEE
    subtract/divide as the pandas path on every non-degenerate group, so
    results hash-match it and the oracle bit-for-bit; for an all-equal
    group (hi == lo, none in the data, test-pinned) all three tiers agree
    on NULL: try_divide here (ANSI Spark's plain Divide would THROW),
    DuckDB v1.0.0's float zero-divisor rule in the oracle, and the demo's
    numpy NaN arriving as Arrow NULL."""
    e = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    stats = e.groupBy("event_type").agg(
        F.min("value").alias("__lo"), F.max("value").alias("__hi")
    )
    # eqNullSafe: groupBy (and the oracle's window PARTITION BY) treat
    # NULL event_type as one group; a plain equi-join would drop its rows
    return (
        e.alias("e")
        .join(
            F.broadcast(stats.alias("s")),
            F.col("e.event_type").eqNullSafe(F.col("s.event_type")),
        )
        .select(
            F.col("e.event_id").alias("event_id"),
            F.col("e.event_type").alias("event_type"),
            F.col("e.value").alias("value"),
            # constant group (hi == lo): ANSI Spark's plain Divide THROWS
            # on a zero divisor; try_divide yields NULL, which matches
            # DuckDB's float x/0 (checked on v1.0.0: NULL, not IEEE NaN)
            # and the demo tier (its numpy NaN lands as Arrow NULL)
            F.try_divide(
                F.col("e.value") - F.col("s.__lo"),
                F.col("s.__hi") - F.col("s.__lo"),
            ).alias("norm_value"),
        )
    )


# --------------------------------------------------------------------------
# pandas_udf GROUPED_AGG: custom aggregate (value range per group).
# --------------------------------------------------------------------------
@register(
    "udf_grouped_agg_value_range",
    oracle="""
    SELECT event_type,
           MAX(value) - MIN(value) AS value_range,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def udf_grouped_agg_value_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via pandas_udf GROUPED_AGG. Unlike built-in aggregates
    this has NO partial/map-side combine — every group's rows move to one
    task — so at scale prefer built-ins (max-min here is expressible as
    F.max - F.min and would be map-side combined); this query exists to
    prove the surface with an oracle-exact result."""
    @F.pandas_udf("double")
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is pandas-side too
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    e = load_table(spark, "events", sf_dir)
    return e.groupBy("event_type").agg(
        value_range("value").alias("value_range"),
        n_rows("value").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Scalar pandas_udf: vectorized token counting.
# --------------------------------------------------------------------------
@register(
    "udf_scalar_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[^ \t\n\r]+')) AS n_tokens
    FROM documents
    """,
)
def udf_scalar_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow batches in/out). Integer
    output, so engine float semantics never enter. The built-in
    equivalent (size(split(...))) stays in codegen and is what the text
    operators use; this is the escape-hatch pattern for logic F.* can't
    express."""
    @F.pandas_udf("integer")
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.count(r"\S+").fillna(0).astype("int32")

    d = load_table(spark, "documents", sf_dir)
    return d.select("doc_id", n_tokens("text").alias("n_tokens"))


# --------------------------------------------------------------------------
# Python UDTF: lateral one-to-N expansion of the dynamic columns map.
# --------------------------------------------------------------------------
@register(
    "udtf_explode_event_columns",
    oracle="""
    SELECT event_id AS wal_position,
           'k' AS col_name,
           json_extract_string(props, '$.k') AS col_value
    FROM events
    """,
)
def udtf_explode_event_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: each event's dynamic columns map fans out to one row
    per column — the UDTF analogue of the reference's per-column decode
    loop (postgres.go:399-425). Built-in explode() covers this exact case
    (and stays JVM-side); the UDTF form is the template for expansions
    with real per-row logic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="col_name: string, col_value: string")
    class ExplodeColumns:
        def eval(self, columns):  # noqa: A002
            if columns is not None:
                for k in sorted(columns):
                    yield k, columns[k]

    e = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("wal_position"),
        F.from_json("props", "map<string,string>").alias("columns"),
    )
    e.createOrReplaceTempView("udtf_events_src")
    spark.udtf.register("explode_columns", ExplodeColumns)
    return spark.sql(
        """
        SELECT s.wal_position, t.col_name, t.col_value
        FROM udtf_events_src s, LATERAL explode_columns(s.columns) t
        """
    )


# --------------------------------------------------------------------------
# approx_count_distinct: the sketch path, checked against exact counts.
# --------------------------------------------------------------------------
@register(
    "agg_approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch. Sketch values differ across
    engines by construction, so the oracle checks the CONTRACT instead:
    the approximation lands within 5% of the exact count (both sides also
    emit the exact count). The sketch runs at rsd=0.01 so the asserted 5%
    band is a 5-sigma envelope — rsd equal to the band (1 sigma) actually
    exceeded it on every sf0.1 group. At 100 TB this is the only sane
    distinct-count: the sketch is fixed-size, mergeable, map-side
    combined; exact COUNT(DISTINCT) shuffles every distinct value.

    The exact and approximate counts are computed in SEPARATE
    aggregations joined on the 5-row group frame — never mixed in one
    agg: Spark's one-distinct rewrite keys the partial state by
    (group, distinct-col), so a mixed agg carries the ~16 KB rsd=0.01
    HLL++ buffer once per DISTINCT (event_type, user_id) pair instead
    of once per group. Measured at sf30 (30M events): 4.8 s exact +
    1.9 s approx separately, 105 s mixed — a 15x pathology for the same
    result."""
    e = load_table(spark, "events", sf_dir)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_approx_users")
    )
    # Null-safe join key: groupBy keeps a NULL event_type group on both
    # sides, but a plain equality join would silently drop it — the
    # split-into-two-aggregations form must preserve the single-agg
    # semantics for nullable group keys, not just the current testdata.
    approx = approx.withColumnRenamed("event_type", "_et")
    return (
        exact.join(
            F.broadcast(approx),
            exact["event_type"].eqNullSafe(approx["_et"]),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(
                    F.col("_approx_users").cast("double")
                    - F.col("exact_users").cast("double")
                )
                / F.col("exact_users").cast("double")
                < F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
    )
