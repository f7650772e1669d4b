"""Scalar function surface: string / date / math / array / JSON.

All JVM-side built-ins (`pyspark.sql.functions`) — no Python UDFs — so
every expression stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


@register(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, '/', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           REGEXP_EXTRACT(p_type, '([A-Z]+)', 1) AS first_word,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           TRIM(CONCAT(' ', p_brand, ' ')) AS trimmed
    FROM part
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) + 1 AS order_dow,
           date_trunc('month', o_orderdate) AS order_month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '1998-12-01 00:00:00') AS INT) AS days_to_cutoff,
           strftime(o_orderdate, '%Y-%m') AS order_ym
    FROM orders
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("1998-12-01 00:00:00").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_cutoff"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
    )


@register(
    "scalar_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice * l_discount AS DECIMAL(38,8)), 2)
                AS DOUBLE) AS discount_amt,
           ABS(l_quantity - 25.0) AS qty_dev,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           CAST(CEIL(l_quantity / 10.0) AS BIGINT) AS qty_decile,
           ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # round on the exact decimal (scale 8 recovers the true product) so
        # both engines see the same half-up boundary, then back to double
        F.round((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,8)"), 2)
        .cast("double")
        .alias("discount_amt"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 10.0).cast("long").alias("qty_decile"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "scalar_array_functions",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[len(string_split(text, ' '))] AS last_token,
           CASE WHEN list_contains(string_split(text, ' '), 'spark')
                THEN 1 ELSE 0 END AS has_spark,
           array_to_string(string_split(text, ' ')[1:3], '-') AS first3
    FROM documents
    """,
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
    )


@register(
    "scalar_json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid_json
    FROM events
    """,
)
def scalar_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.when(F.get_json_object("props", "$.k").isNotNull() | (F.col("props") == "{}"), 1)
        .otherwise(0)
        .alias("is_valid_json"),
    )


@register(
    "scalar_conditional_functions",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
           CASE WHEN c_acctbal > 0
                THEN FLOOR(c_acctbal + 0.5) / 100.0 END AS bal_pct
    FROM customer
    """,
)
def scalar_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bal_pct is ROUND(c_acctbal/100, 2) spelled as FLOOR(x+0.5)/100:
    native round() diverges cross-engine on a 2-decimal double — Spark
    rounds the shortest decimal representation (HALF_UP on "38.105"),
    DuckDB the exact binary (38.104999...) — while floor arithmetic is
    pure IEEE and bit-identical in both. Positive-only here, where
    floor(x+0.5) IS round-half-up."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_masked"),
        F.when(
            F.col("c_acctbal") > 0,
            F.floor(F.col("c_acctbal") + F.lit(0.5)) / F.lit(100.0),
        ).alias("bal_pct"),
    )


@register(
    "scalar_map_functions",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INT) AS n_props,
           json_extract_string(props, '$.k') AS k_text,
           CASE WHEN list_contains(json_keys(props), 'k') THEN 1 ELSE 0 END
             AS has_k
    FROM events
    """,
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_* surface over the dynamic JSON payload — the same
    map<string,string> transport the CDC envelope uses for row columns.
    Keys are sorted before comparison: map iteration order is not part of
    either engine's contract."""
    e = load_table(spark, "events", sf_dir)
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_props"),
        F.element_at(m, "k").alias("k_text"),
        F.when(F.array_contains(F.map_keys(m), "k"), 1).otherwise(0).alias("has_k"),
    )
