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


# --------------------------------------------------------------------------
# Outlier profiling: 3-sigma counts per event_type with decimal-exact
# moments. stddev_samp() is summation-order-dependent in doubles, so the
# mean/variance are derived from decimal sums (sum, sum-of-squares) that
# both engines compute bit-identically; every downstream comparison then
# sees identical bounds.
# --------------------------------------------------------------------------
_DSUM_V = "CAST(ROUND(SUM(CAST((value) AS DECIMAL(38,8))), 2) AS DOUBLE)"
_DSUM_V2 = "CAST(ROUND(SUM(CAST((value * value) AS DECIMAL(38,8))), 2) AS DOUBLE)"


@register(
    "profile_value_outliers",
    oracle=f"""
    WITH moments AS (
      SELECT event_type,
             COUNT(*) AS n,
             {_DSUM_V} AS s1,
             {_DSUM_V2} AS s2
      FROM events GROUP BY event_type
    ),
    bounds AS (
      SELECT event_type, n,
             s1 / n AS mean,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
      FROM moments WHERE n > 1
    )
    SELECT b.event_type AS event_type, b.n AS n,
           ROUND(b.mean, 6) AS mean,
           ROUND(b.std, 6) AS std,
           COUNT(*) FILTER (WHERE e.value > b.mean + 3 * b.std
                               OR e.value < b.mean - 3 * b.std) AS n_outliers
    FROM events e JOIN bounds b ON b.event_type = e.event_type
    GROUP BY b.event_type, b.n, b.mean, b.std
    """,
)
def profile_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3-sigma outlier counts — the data-quality gate that flags
    a broken upstream emitter. Two passes: a map-side-combined moments
    aggregate (count/sum/sum-of-squares as decimals), then a broadcast of
    the ~|types| bounds back over the scan for the outlier count. The
    second pass is the unavoidable one — z-scores need global moments —
    and it is a broadcast join, never a shuffle of the events."""
    from psql_streamer_spark.functions.numeric import DEC

    e = load_table(spark, "events", sf_dir)
    moments = (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("s1"),
            F.round(F.sum((F.col("value") * F.col("value")).cast(DEC)), 2)
            .cast("double")
            .alias("s2"),
        )
        .filter(F.col("n") > 1)
    )
    bounds = moments.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    outlier = (F.col("value") > F.col("mean") + 3 * F.col("std")) | (
        F.col("value") < F.col("mean") - 3 * F.col("std")
    )
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", "mean", "std")
        .agg(F.count(F.when(outlier, 1)).alias("n_outliers"))
        .select(
            "event_type",
            "n",
            F.round("mean", 6).alias("mean"),
            F.round("std", 6).alias("std"),
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# Numeric correlation profile: Pearson r across lineitem's measure columns.
# --------------------------------------------------------------------------
# The classic profiling complement to per-column moments: pairwise linear
# relationships across the fact table's measures. corr is computed from
# the textbook sufficient statistics (n, Sx, Sy, Sxx, Syy, Sxy) — ONE
# map-side-combined aggregate over the corpus, then pure expression math
# on the single result row; the six pair rows come from an unpivot of
# that row (stack), so the fact table is scanned exactly once no matter
# how many pairs are profiled.
#
# Determinism contract: every sum goes through the exact-decimal idiom
# (functions/numeric.py — decimal(38,8) accumulate, round to scale 2,
# cast double), after which the corr formula is a FIXED shape of single
# IEEE754 ops both engines execute identically — the same two-step
# discipline as profile_value_outliers and audit_split_token_drift.
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_pairs():
    return [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]


def _sql_corr_profile() -> str:
    from psql_streamer_spark.functions.numeric import sql_dsum

    # Products of two doubles must NOT be cast double->decimal (the
    # binary product's extra digits round differently across engines —
    # observed as last-ulp corr mismatches). Cast each FACTOR to its
    # true 2-decimal precision first (the benign cast case: both
    # engines recover the intended decimal exactly), multiply in exact
    # decimal, then sum.
    def d2(c):
        return f"CAST({c} AS DECIMAL(18,2))"

    def dprod_sum(a, b):
        return f"CAST(ROUND(SUM({d2(a)} * {d2(b)}), 2) AS DOUBLE)"

    sums = [f"COUNT(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"{sql_dsum(c)} AS s_{c}")
        sums.append(f"{dprod_sum(c, c)} AS s_{c}_{c}")
    for a, b in _corr_pairs():
        sums.append(f"{dprod_sum(a, b)} AS s_{a}_{b}")
    selects = []
    for a, b in _corr_pairs():
        corr = (
            f"(n * s_{a}_{b} - s_{a} * s_{b}) / "
            f"sqrt((n * s_{a}_{a} - s_{a} * s_{a})"
            f" * (n * s_{b}_{b} - s_{b} * s_{b}))"
        )
        # report at 9 decimals: the extendedprice sums carry >15
        # significant digits, where the engines' decimal->double casts
        # stop agreeing on the last ulp (the numeric.py bound) — the
        # same fixed-precision reporting profile_value_outliers uses
        selects.append(
            f"SELECT '{a}~{b}' AS pair, n, ROUND({corr}, 9) AS corr FROM m"
        )
    return "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem) " + \
        " UNION ALL ".join(selects)


@register("profile_numeric_correlations", oracle=_sql_corr_profile())
def profile_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's four measure columns
    (six pairs), one row per pair: (pair, n, corr). Single fact-table
    pass; the pair rows unpivot from the one aggregate row via stack."""
    from psql_streamer_spark.functions.numeric import dsum

    li = load_table(spark, "lineitem", sf_dir)

    def dprod_sum(a: str, b: str):
        # factor-first decimal cast: see the oracle builder's note
        pa = F.col(a).cast("decimal(18,2)") * F.col(b).cast("decimal(18,2)")
        return F.round(F.sum(pa), 2).cast("double")

    aggs = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        aggs.append(dsum(F.col(c)).alias(f"s_{c}"))
        aggs.append(dprod_sum(c, c).alias(f"s_{c}_{c}"))
    for a, b in _corr_pairs():
        aggs.append(dprod_sum(a, b).alias(f"s_{a}_{b}"))
    m = li.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("n")
        num = n * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(
            (n * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * (n * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        )
        return num / den

    stack_args = []
    for a, b in _corr_pairs():
        stack_args.append(F.lit(f"{a}~{b}"))
        stack_args.append(F.round(corr(a, b), 9))  # see the oracle's note
    return m.select(
        "n", F.stack(F.lit(len(_corr_pairs())), *stack_args).alias("pair", "corr")
    ).select("pair", "n", "corr")


# --------------------------------------------------------------------------
# Robust (MAD) outlier counts: profile_value_outliers' 3-sigma gate
# breaks down exactly when it matters — a broken emitter spraying huge
# values inflates the mean AND the standard deviation, masking its own
# outliers. The median/MAD pair is outlier-resistant (50% breakdown
# point): med = percentile_disc(0.5) of value, mad = percentile_disc(0.5)
# of |value - med|, flag |value - med| > 3 * 1.4826 * mad (1.4826 is the
# normal-consistency constant, folded into one literal so both engines
# multiply identically). percentile_disc SELECTS actual data elements —
# no interpolation arithmetic — so med/mad are hash-stable raw doubles.
#
# Scale shape: three passes over events, each a map-side-combined
# per-type aggregate or a broadcast of the ~|types| stats back over the
# scan — the events are never shuffled on a non-type key.
# --------------------------------------------------------------------------
MAD_OUTLIER_K = 4.4478  # 3 * 1.4826


@register(
    "profile_value_outliers_mad",
    oracle=f"""
    WITH med AS (
      SELECT event_type, COUNT(*) AS n,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             percentile_disc(0.5)
               WITHIN GROUP (ORDER BY ABS(e.value - m.med)) AS mad
      FROM events e JOIN med m ON m.event_type = e.event_type
      GROUP BY e.event_type
    )
    SELECT m.event_type, m.n,
           m.med AS median_value,
           d.mad,
           COUNT(*) FILTER (WHERE ABS(e.value - m.med)
                                  > {MAD_OUTLIER_K} * d.mad) AS n_outliers
    FROM events e
    JOIN med m ON m.event_type = e.event_type
    JOIN mad d ON d.event_type = e.event_type
    GROUP BY m.event_type, m.n, m.med, d.mad
    """,
)
def profile_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust outlier counts via median/MAD (see banner) — the
    companion profile_value_outliers consults when its own mean/std may
    have been dragged by the contamination it is looking for."""
    return value_outliers_mad_frame(
        load_table(spark, "events", sf_dir).select("event_type", "value")
    )


def value_outliers_mad_frame(e: DataFrame) -> DataFrame:
    """profile_value_outliers_mad's body over any (event_type, value)
    frame — split out so the MASKING case (a contaminated group whose
    inflated mean/std hides its own outliers from the 3-sigma gate, the
    scenario this op exists for) is pinned on a planted frame in tests."""
    med = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
        ).alias("med"),
    )
    mad = (
        e.join(F.broadcast(med.select("event_type", "med")), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile_disc(0.5)"
                " WITHIN GROUP (ORDER BY abs(value - med))"
            ).alias("mad")
        )
    )
    outlier = F.abs(F.col("value") - F.col("med")) > (
        F.lit(MAD_OUTLIER_K) * F.col("mad")
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med", "mad")
        .agg(F.count(F.when(outlier, 1)).alias("n_outliers"))
        .select(
            "event_type",
            "n",
            F.col("med").alias("median_value"),
            "mad",
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# Per-source token-distribution drift: WHICH source is the outlier.
# audit_split_token_drift asks whether train and test disagree;
# streaming/drift_stream.py watches the live FEED; this is the batch,
# oracle-checked third face — each source's token distribution against
# the whole corpus, over the top-SOURCE_DRIFT_TOP_K tokens plus an
# everything-else (OOV) bucket (the same bound-the-categories discipline
# as the stream monitor's reference cap). The operational read: the
# source whose extractor broke, whose language mix flipped, or whose
# crawl drifted shows up as the tv_drift outlier, and top_token names
# the token that moved most.
#
# Statistic: scaled total-variation distance. Per category i,
# dev_i = |C_i * S_s - d_i * T| (C_i corpus count, d_i source count,
# T/S_s the corpus/source totals) — an INTEGER, so the per-source sum is
# exact and order-free where a float (p-q)^2/(p+q) sum would depend on
# aggregation order; tv_drift = tv_num / (2*T*S_s) in [0, 1] is one
# final double division, rounded like every reported ratio in this
# repo. Products fit BIGINT while T*S_s < 2^63 (~3e9 tokens on each
# side); past that ANSI mode fails loudly and the three products promote
# to DECIMAL(38,0) with the report shape unchanged.
#
# Scale shape: ONE (token, source)-keyed aggregate over the corpus (the
# text_token_corpus_freq shuffle); everything downstream operates on
# K-or-|sources|-bounded frames (top-K via TakeOrdered, broadcast grid
# joins, a window over K+1 rows per source).
# --------------------------------------------------------------------------
SOURCE_DRIFT_TOP_K = 64
SOURCE_DRIFT_OOV = "__OOV__"  # words_expr lowercases, so this cannot collide

from psql_streamer_spark.functions.text_hash import SQL_WORDS  # noqa: E402
from psql_streamer_spark.operators.mlprep import sql_md5_bucket  # noqa: E402

_SQL_WS_TOKENS = SQL_WORDS.format(t="text")

_SQL_SOURCE_DRIFT = f"""
    WITH tok AS (
      SELECT source, unnest({_SQL_WS_TOKENS}) AS token FROM documents
    ),
    per AS (
      SELECT token, source, CAST(COUNT(*) AS BIGINT) AS d
      FROM tok GROUP BY token, source
    ),
    corpus AS (
      SELECT token, CAST(SUM(d) AS BIGINT) AS c FROM per GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM corpus),
    srcs AS (
      SELECT source, CAST(SUM(d) AS BIGINT) AS s FROM per GROUP BY source
    ),
    ref AS (
      SELECT token, c FROM corpus
      ORDER BY c DESC, token LIMIT {SOURCE_DRIFT_TOP_K}
    ),
    refsum AS (SELECT CAST(SUM(c) AS BIGINT) AS cref FROM ref),
    obs AS (
      SELECT p.source, p.token, p.d
      FROM per p JOIN ref r ON r.token = p.token
    ),
    dev AS (
      SELECT g.source, g.token,
             ABS(g.c * g.s - COALESCE(o.d, 0) * g.t) AS dev
      FROM (SELECT r.token, r.c, s.source, s.s, t.t
            FROM ref r CROSS JOIN srcs s CROSS JOIN tot t) g
      LEFT JOIN obs o ON o.token = g.token AND o.source = g.source
    ),
    matched AS (
      SELECT source, CAST(SUM(d) AS BIGINT) AS m FROM obs GROUP BY source
    ),
    oov AS (
      SELECT s.source, '{SOURCE_DRIFT_OOV}' AS token,
             ABS((t.t - rs.cref) * s.s
                 - (s.s - COALESCE(m.m, 0)) * t.t) AS dev,
             (s.s - COALESCE(m.m, 0)) AS oov_tokens
      FROM srcs s CROSS JOIN tot t CROSS JOIN refsum rs
      LEFT JOIN matched m ON m.source = s.source
    ),
    alldev AS (
      SELECT source, token, dev FROM dev
      UNION ALL
      SELECT source, token, dev FROM oov
    ),
    agg AS (
      SELECT source, CAST(SUM(dev) AS BIGINT) AS tv_num
      FROM alldev GROUP BY source
    ),
    top AS (
      SELECT source, token AS top_token, dev AS top_token_dev,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY dev DESC, token) AS rn
      FROM alldev
    )
    SELECT a.source,
           s.s AS n_tokens,
           o.oov_tokens,
           a.tv_num,
           CASE WHEN s.s = 0 THEN NULL
                ELSE ROUND(a.tv_num * 1.0 / (2.0 * t.t * s.s), 8)
           END AS tv_drift,
           tp.top_token,
           CAST(tp.top_token_dev AS BIGINT) AS top_token_dev
    FROM agg a
    JOIN srcs s ON s.source = a.source
    JOIN oov o ON o.source = a.source
    JOIN (SELECT * FROM top WHERE rn = 1) tp ON tp.source = a.source
    CROSS JOIN tot t
"""


@register("profile_source_token_drift", oracle=_SQL_SOURCE_DRIFT)
def profile_source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source scaled total-variation drift vs the corpus (see
    banner): one row per source with its token total, OOV mass outside
    the corpus top-K, the exact integer deviation sum, the [0,1]
    tv_drift ratio, and the single most-moved category."""
    return source_token_drift_frame(load_table(spark, "documents", sf_dir))


def source_token_drift_frame(d: DataFrame) -> DataFrame:
    """profile_source_token_drift's body over any (source, text) frame —
    split out so the statistic's extremes (a source matching the corpus
    mix scores ~0; a disjoint-vocabulary source scores ~cref/T) are
    pinned on planted frames in tests."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.text_hash import with_words

    tok = with_words(d).select(
        F.explode("__words").alias("token"), "source"
    )
    per = tok.groupBy("token", "source").agg(
        F.count("*").cast("bigint").alias("d")
    )
    corpus = per.groupBy("token").agg(F.sum("d").cast("bigint").alias("c"))
    tot = corpus.agg(F.sum("c").cast("bigint").alias("t"))
    srcs = per.groupBy("source").agg(F.sum("d").cast("bigint").alias("s"))
    ref = corpus.orderBy(F.col("c").desc(), "token").limit(
        SOURCE_DRIFT_TOP_K
    )
    refsum = ref.agg(F.sum("c").cast("bigint").alias("cref"))
    obs = per.join(F.broadcast(ref.select("token")), "token")
    grid = (
        ref.crossJoin(F.broadcast(srcs))
        .crossJoin(F.broadcast(tot))
    )
    dev = grid.join(
        F.broadcast(obs), ["token", "source"], "left"
    ).select(
        "source",
        "token",
        F.abs(
            F.col("c") * F.col("s") - F.coalesce("d", F.lit(0)) * F.col("t")
        ).alias("dev"),
    )
    matched = obs.groupBy("source").agg(
        F.sum("d").cast("bigint").alias("m")
    )
    oov = (
        srcs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(refsum))
        .join(F.broadcast(matched), "source", "left")
        .select(
            "source",
            F.lit(SOURCE_DRIFT_OOV).alias("token"),
            F.abs(
                (F.col("t") - F.col("cref")) * F.col("s")
                - (F.col("s") - F.coalesce("m", F.lit(0))) * F.col("t")
            ).alias("dev"),
            (F.col("s") - F.coalesce("m", F.lit(0))).alias("oov_tokens"),
        )
    )
    alldev = dev.unionByName(oov.select("source", "token", "dev"))
    agg = alldev.groupBy("source").agg(
        F.sum("dev").cast("bigint").alias("tv_num")
    )
    w_top = W.partitionBy("source").orderBy(F.col("dev").desc(), "token")
    top = (
        alldev.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("token").alias("top_token"),
            F.col("dev").cast("bigint").alias("top_token_dev"),
        )
    )
    return (
        agg.join(F.broadcast(srcs), "source")
        .join(F.broadcast(oov.select("source", "oov_tokens")), "source")
        .join(F.broadcast(top), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("s").alias("n_tokens"),
            "oov_tokens",
            "tv_num",
            F.when(
                F.col("s") == 0, F.lit(None).cast("double")
            )
            .otherwise(
                F.round(
                    F.col("tv_num") * F.lit(1.0)
                    / (F.lit(2.0) * F.col("t") * F.col("s")),
                    8,
                )
            )
            .alias("tv_drift"),
            "top_token",
            "top_token_dev",
        )
    )


# --------------------------------------------------------------------------
# Embedding-space drift of the ingest delta: the third face of the drift
# triad (profile_source_token_drift watches sources in TOKEN space,
# streaming/drift_stream.py watches the live feed; this watches the
# daily delta in EMBEDDING space — the signal that catches a swapped or
# retrained upstream encoder, which token statistics cannot see because
# the text did not change). Delta convention is the repo's md5-bucket
# "arrived today" slice, same as dedup_exact_incremental, applied to
# vec_id.
#
# Exactness: cross-row float sums are order-dependent (the reason
# functions/numeric.py exists), so the per-dimension means are computed
# on a GLOBAL fixed-point grid instead: qx = FLOOR(x * 1000) — floor of
# one IEEE multiply, bit-identical cross-engine — making every
# per-dimension sum an exact BIGINT. dev_d = |S_delta_d * N_prior -
# S_prior_d * N_delta| is the cross-multiplied mean gap (integer, no
# division), l1_dev its order-free sum over dimensions, and
# mean_shift_q = l1_dev / (n_dims * N_delta * N_prior) — the average
# per-dimension mean shift in grid units — is the single rounded double.
# Products fit BIGINT to ~1e9 vectors per side (ANSI fails loudly past
# that; the promotion is DECIMAL(38,0) with the shape unchanged).
#
# Scale shape: one posexplode + a 64-group map-side-combined aggregate;
# the drift assembly is 64 rows regardless of corpus size (the window
# that picks top_dim orders 64 rows).
# --------------------------------------------------------------------------
EMBED_DRIFT_GRID = 1000  # fixed-point grid: qx = FLOOR(x * 1000)

_SQL_EMBED_DELTA = f"{sql_md5_bucket('vec_id', 10)} = 7"

_SQL_EMBED_DRIFT = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             ({_SQL_EMBED_DELTA}) AS is_delta
      FROM embeddings
    ),
    q AS (
      SELECT is_delta, CAST(t.i - 1 AS BIGINT) AS dim,
             CAST(FLOOR(e[t.i] * {EMBED_DRIFT_GRID}) AS BIGINT) AS qx
      FROM v, unnest(range(1, len(e)+1)) AS t(i)
    ),
    counts AS (
      SELECT CAST(COUNT(*) FILTER (is_delta) AS BIGINT) AS n_delta,
             CAST(COUNT(*) FILTER (NOT is_delta) AS BIGINT) AS n_prior
      FROM v
    ),
    per AS (
      SELECT dim,
             CAST(COALESCE(SUM(qx) FILTER (is_delta), 0) AS BIGINT)
               AS s_delta,
             CAST(COALESCE(SUM(qx) FILTER (NOT is_delta), 0) AS BIGINT)
               AS s_prior
      FROM q GROUP BY dim
    ),
    dev AS (
      SELECT dim, ABS(s_delta * c.n_prior - s_prior * c.n_delta) AS dev
      FROM per CROSS JOIN counts c
    ),
    top AS (
      SELECT dim, dev,
             ROW_NUMBER() OVER (ORDER BY dev DESC, dim) AS rn
      FROM dev
    )
    SELECT c.n_delta, c.n_prior,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dev) AS n_dims,
           (SELECT CAST(SUM(dev) AS BIGINT) FROM dev) AS l1_dev,
           CASE WHEN c.n_delta = 0 OR c.n_prior = 0 THEN NULL
                ELSE ROUND((SELECT SUM(dev) FROM dev) * 1.0
                           / ((SELECT COUNT(*) FROM dev) * 1.0
                              * c.n_delta * c.n_prior), 6)
           END AS mean_shift_q,
           (SELECT CAST(dim AS BIGINT) FROM top WHERE rn = 1) AS top_dim,
           (SELECT CAST(dev AS BIGINT) FROM top WHERE rn = 1)
             AS top_dim_dev
    FROM counts c
"""


@register("profile_embedding_drift", oracle=_SQL_EMBED_DRIFT)
def profile_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row embedding-drift report for the ingest delta vs the prior
    corpus (see banner): slice sizes, the exact integer L1 mean-gap over
    dimensions, its normalized per-dimension average in grid units, and
    the most-shifted dimension."""
    from psql_streamer_spark.operators.mlprep import md5_bucket

    v = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return embedding_drift_frame(
        v, md5_bucket(F.col("vec_id"), 10) == 7
    )


def embedding_drift_frame(v: DataFrame, is_delta) -> DataFrame:
    """profile_embedding_drift's body over any (vec_id, e) frame with an
    ``is_delta`` membership Column — split out so a planted mean-shifted
    delta (which the synthetic embeddings, drawn from one distribution,
    never produce) is pinned in tests."""
    from pyspark.sql import Window as W

    flagged = v.select(is_delta.alias("is_delta"), "e")
    counts = flagged.agg(
        F.count_if("is_delta").cast("bigint").alias("n_delta"),
        F.count_if(~F.col("is_delta")).cast("bigint").alias("n_prior"),
    )
    q = flagged.select(
        "is_delta", F.posexplode("e").alias("dim", "x")
    ).select(
        "is_delta",
        F.col("dim").cast("bigint").alias("dim"),
        F.floor(F.col("x") * EMBED_DRIFT_GRID).cast("bigint").alias("qx"),
    )
    per = q.groupBy("dim").agg(
        F.coalesce(F.sum(F.when(F.col("is_delta"), F.col("qx"))), F.lit(0))
        .cast("bigint")
        .alias("s_delta"),
        F.coalesce(
            F.sum(F.when(~F.col("is_delta"), F.col("qx"))), F.lit(0)
        )
        .cast("bigint")
        .alias("s_prior"),
    )
    dev = per.crossJoin(F.broadcast(counts)).select(
        "dim",
        F.abs(
            F.col("s_delta") * F.col("n_prior")
            - F.col("s_prior") * F.col("n_delta")
        ).alias("dev"),
    )
    agg = dev.agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.sum("dev").cast("bigint").alias("l1_dev"),
    )
    top = (
        dev.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("dev").desc(), "dim")),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("dim").alias("top_dim"),
            F.col("dev").alias("top_dim_dev"),
        )
    )
    return (
        counts.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(top))
        .select(
            "n_delta",
            "n_prior",
            "n_dims",
            "l1_dev",
            F.when(
                (F.col("n_delta") == 0) | (F.col("n_prior") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.col("l1_dev")
                    * F.lit(1.0)
                    / (
                        F.col("n_dims")
                        * F.lit(1.0)
                        * F.col("n_delta")
                        * F.col("n_prior")
                    ),
                    6,
                )
            )
            .alias("mean_shift_q"),
            "top_dim",
            "top_dim_dev",
        )
    )
