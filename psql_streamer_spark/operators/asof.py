"""Custom join strategies Spark lacks as built-ins: as-of join, salted
skew join.

Reference scope note: the reference has no joins at all (SURVEY.md §2.3);
these belong to the engine's extended surface. Both are implemented as
compositions of built-in operators (SURVEY §7 custom-operator rule (a)) —
no UDFs, no driver-side state.

As-of join (point-in-time): for each left row, the single latest right row
whose timestamp is <= the left row's, per key. The classic uses: "the
order state a click saw", feature stores, slowly-changing dims.

Implementation: union both sides tagged, one window per key ordered by
(time, side) forward-fills the latest right payload onto every left row —
ONE shuffle on the key, O(n log n) per partition, no per-key loops, no
range cross-join blowup. merge_asof-in-pandas would cap each key's history
at executor memory; the window form spills.

Salted join: pre-split hot keys so one reducer doesn't take the whole hot
partition. AQE's skew-join handles this at runtime for sort-merge joins;
the explicit salt is for when you KNOW the skew (power-law keys at 100 TB)
and want the split at plan time, or the join is hash-based where AQE skew
handling doesn't apply.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: latest right row with right_ts <= left_ts per
    key. Right rows must be unique per (key, ts) — pre-aggregate if not,
    or the fill picks an arbitrary one of the ties.

    Returns left columns + right payload columns (right key column is
    dropped; right_ts is kept). how="left" keeps unmatched left rows with
    NULL payload; "inner" drops them.
    """
    right_payload = [c for c in right.columns if c != right_on]
    l = (
        left.withColumn("_t", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_k", F.col(left_on))
    )
    r = (
        right.withColumn("_t", F.col(right_ts))
        .withColumn("_side", F.lit(0))
        .withColumn("_k", F.col(right_on))
        .drop(right_on)
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at equal time -> `<=` semantics
    w = W.partitionBy("_k").orderBy("_t", "_side").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    # Fill ONE struct of all payload columns, not each column independently:
    # per-column fills could stitch together values from different right
    # rows when a payload column is NULL in the matched row. The struct is
    # non-null for every right row (a struct of NULL fields is still a
    # value), so it doubles as the inner-match marker — NULL means "no
    # right row at or before this left ts", even if every payload column
    # of the matched row is NULL.
    payload_struct = F.when(F.col("_side") == 0, F.struct(*right_payload))
    filled = merged.withColumn(
        "_r", F.last(payload_struct, ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_r").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    return out.select(
        *left.columns,
        *[F.col("_r").getField(c).alias(c) for c in right_payload],
    )


@register(
    "join_asof_latest_order",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM events e
    ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event sees the customer's latest order at or
    before the event time (checked against DuckDB's native ASOF JOIN).
    Orders are pre-deduped per (custkey, orderdate) so the as-of pick is
    deterministic on both engines."""
    e = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    o = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select("o_custkey", "o_orderdate", "o_orderkey")
    )
    return asof_join(
        e, o, left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


def _hot_floor(hot_row_threshold: int, sample_fraction: float) -> int:
    """Sampled-count floor for hot-key detection: ceil of the expected
    sample count of a key exactly at the threshold, hard-floored at 2 so
    a key seen ONCE in the sample can never be flagged hot — with int()
    truncation, any product in [1, 2) degenerated the floor to 1 and
    every sampled singleton was flagged (r9 advice, medium)."""
    return max(2, math.ceil(hot_row_threshold * sample_fraction))


def _detect_hot_keys(
    big: DataFrame,
    big_on: str,
    hot_row_threshold: int,
    sample_fraction: float,
    max_hot_keys: int,
) -> list:
    """Seeded-sample hot-key detection: returns the driver-side row list
    of keys whose sampled count clears the floor (bounded by
    ``max_hot_keys``). Split out of ``salted_join`` so tests can assert
    the DETECTOR's output directly — e.g. that an all-singleton corpus
    at boundary params yields an empty hot set (no replication), which
    output-count parity alone cannot observe (replication preserves the
    joined count)."""
    frac_floor = _hot_floor(hot_row_threshold, sample_fraction)
    if hot_row_threshold * sample_fraction < 1:
        raise ValueError(
            "salted_join: hot_row_threshold * sample_fraction = "
            f"{hot_row_threshold * sample_fraction:g} < 1 — a truly-hot "
            "key is expected to appear under once in the sample, so the "
            "sampled count cannot distinguish the threshold from noise. "
            "Raise sample_fraction or hot_row_threshold so their product "
            "is >= 1 (>= 2 for reliable detection of keys exactly AT the "
            "threshold — see the sensitivity note in salted_join)."
        )
    return (
        big.sample(fraction=sample_fraction, seed=42)
        .groupBy(big_on)
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= frac_floor)
        .orderBy(F.desc("_c"))
        .limit(max_hot_keys)
        .select(F.col(big_on).alias("_hotkey"))
        .collect()
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_on: str,
    small_on: str,
    buckets: int = 8,
    salt_by: str | None = None,
    hot_row_threshold: int = 10_000,
    sample_fraction: float = 0.001,
    max_hot_keys: int = 100_000,
) -> DataFrame:
    """Equi-join with HOT-KEY salting: keys the skew detector flags split
    across `buckets` reducers (their `small`-side rows replicated
    `buckets` ways); every other key joins plain with salt 0. Result is
    row-identical to a plain inner join for ANY hot set — salting a key
    never changes which rows match, only which reducer they meet on — so
    the detector is free to be approximate: a seeded (deterministic)
    `sample_fraction` sample counts rows per key and flags keys whose
    estimated row count reaches `hot_row_threshold`. That is how
    production engines detect skew (sampled stats; AQE's skew-join does
    the same from shuffle statistics at runtime).

    The r6 form salted EVERY key, replicating the whole small side
    `buckets` times — fine when the small side is dim-sized, but the
    sf30 sweep (orders grown to 45M rows) measured the 8x replication at
    305 s for a join whose plain form needs none: universal salting is
    the demo form, hot-key salting is the production form, and this
    function now does the latter. With no key over the threshold (TPC-H
    fan-outs are bounded — max ~7 lines per order) the plan degenerates
    to the plain join plus one broadcast of an empty hot set, which is
    exactly what it should cost; the hot path is exercised by the skewed
    synthetic frame in tests/test_asof_join.py.

    `salt_by`: a big-side column whose hash spreads a hot key's rows
    across buckets. When omitted, the WHOLE big-side row is hashed —
    hashing only the join key would put each hot key in ONE bucket and
    silently defeat the salt (full replication cost, zero parallelism
    gain), so that is never the fallback. Any big-side salt assignment
    is row-correct (the small side is replicated to every bucket); the
    spread column only controls how evenly a hot key fans out.

    The hot set is materialized ONCE (collected to the driver and
    rebuilt as a literal frame) before either side joins against it.
    Referencing the sampled frame from both joins would evaluate the
    sample twice, and seeded sample() is only deterministic given
    stable input partitioning — under task retry or round-robin lineage
    the two evaluations could disagree, and a key flagged hot on the
    big side but not the small side silently loses every match on salts
    1..buckets-1. The collect is bounded metadata, not data, and the
    bound is enforced twice: (a) the parameter combination must satisfy
    ``hot_row_threshold * sample_fraction >= 1`` (rejected otherwise),
    and the sampled-count floor is ``max(2, ceil(product))`` — the
    ceil (not int-truncation) plus the hard floor of 2 means a key seen
    ONCE in the sample can never be flagged hot for any accepted
    parameters. The flip side of that hard floor (r10 advice, low): when
    the product is in [1, 2), a key EXACTLY at ``hot_row_threshold``
    lands below the floor in expectation (~1 sampled row vs floor 2), so
    detection sensitivity starts at roughly ``(2 / product) x`` the
    threshold — the guard's product >= 1 keeps the sample statistically
    meaningful, but reliable detection of keys merely AT the threshold
    needs product >= 2. Missing a near-threshold key is a perf-only
    miss (that key simply doesn't parallelize), never a correctness
    one. With truncation, any product in [1, 2) degenerated the
    floor to 1 and every sampled singleton (up to
    ``sample_fraction * |big|`` distinct keys) was flagged, far beyond
    the |big| / hot_row_threshold keys that can truly clear the
    threshold — each then salting (replicating small-side rows
    buckets x) for no benefit;
    (b) a ``max_hot_keys`` Spark-side TakeOrdered keeps only the
    hottest keys by sampled count, so the driver never holds more than
    ``max_hot_keys`` rows regardless of input. Dropping a key from the
    hot set never affects correctness (see above), only how evenly that
    key parallelizes."""
    hot_local = _detect_hot_keys(
        big, big_on, hot_row_threshold, sample_fraction, max_hot_keys
    )
    hot = big.sparkSession.createDataFrame(
        hot_local,
        schema=T.StructType(
            [T.StructField("_hotkey", big.schema[big_on].dataType, True)]
        ),
    )
    spread = (
        F.col(salt_by)
        if salt_by
        else F.struct(*[F.col(c) for c in big.columns])
    )
    salt_col = F.pmod(F.hash(spread), F.lit(buckets))
    b = (
        big.join(F.broadcast(hot), F.col(big_on) == F.col("_hotkey"), "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hotkey").isNotNull(), salt_col).otherwise(F.lit(0)),
        )
        .drop("_hotkey")
    )
    s = (
        small.join(F.broadcast(hot), F.col(small_on) == F.col("_hotkey"), "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hotkey").isNotNull(),
                    F.sequence(F.lit(0), F.lit(buckets - 1)),
                ).otherwise(F.sequence(F.lit(0), F.lit(0)))
            ),
        )
        .drop("_hotkey")
    )
    out = b.join(
        s,
        (F.col(big_on) == F.col(small_on)) & (b["_salt"] == s["_salt"]),
    )
    return out.drop("_salt")


@register(
    "join_salted_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_lines, MAX(l.l_orderkey) AS max_ok
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-join correctness proof: lineitem⋈orders with 8-way salting
    (salted on l_linenumber so a hot orderkey's lines spread across
    buckets) aggregates to exactly the plain-join result."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber"
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        l, o, big_on="l_orderkey", small_on="o_orderkey",
        buckets=8, salt_by="l_linenumber",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"), F.max("l_orderkey").alias("max_ok")
    )
