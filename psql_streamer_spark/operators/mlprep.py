"""Training-data preparation operators: deterministic splits, stratified
sampling, PII redaction.

North-star scope (BASELINE.json): a 100 TB corpus pipeline needs
reproducible train/val/test assignment and sampling that is a pure
function of the row key — never rand(), whose result would change per run,
per retry, and per partition layout. The md5-bucket idiom used here is the
distributed-systems standard: assignment is stable under repartitioning,
retries, and incremental reprocessing, and both engines replay it exactly
(same idiom as similarity.py's deterministic hyperplanes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from psql_streamer_spark.registry import register
from psql_streamer_spark.sources.tables import load_table


def md5_bucket(key: Column, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of the
    key as an integer, mod buckets. Stable across engines, runs, and
    partitionings — the property rand(seed) does NOT have under retries."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def sql_md5_bucket(key_expr: str, buckets: int) -> str:
    """DuckDB twin of :func:`md5_bucket`."""
    return (
        f"CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT)"
        f" % {buckets}"
    )


# --------------------------------------------------------------------------
# Train/val/test split: 80/10/10 by document key.
# --------------------------------------------------------------------------
_B = sql_md5_bucket("doc_id", 100)


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT CASE WHEN {_B} < 80 THEN 'train'
                WHEN {_B} < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split as a pure function of doc_id. A doc's split never
    changes when the corpus grows — append-only ingestion keeps historical
    assignments, which leakage audits depend on."""
    d = load_table(spark, "documents", sf_dir)
    b = md5_bucket(F.col("doc_id"), 100)
    return (
        d.withColumn(
            "split",
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Stratified sampling: fixed rate per stratum, deterministic membership.
# --------------------------------------------------------------------------
@register(
    "sample_stratified_events",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE {sql_md5_bucket("event_id", 1000)} < 100)
             AS n_sampled
    FROM events
    GROUP BY event_type
    """,
)
def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% per event_type stratum via key-hash membership. Unlike
    df.sampleBy, membership is reproducible row-identical across runs and
    engines; the count-vs-sampled output doubles as the rate audit."""
    e = load_table(spark, "events", sf_dir)
    sampled = md5_bucket(F.col("event_id"), 1000) < 100
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(sampled, 1)).alias("n_sampled"),
    )


# --------------------------------------------------------------------------
# PII redaction: regex scrub of emails/phone patterns before training.
# --------------------------------------------------------------------------
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"


@register(
    "text_redact_pii",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             substr(text, 1, 40) || ' contact user' || doc_id
               || '@example.com or 555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM synth
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training scrub: emails and phone-shaped tokens replaced with
    typed placeholders. Narrow regexp_replace map — scan-bound, no shuffle;
    the synthetic injection makes the redaction observable on the test
    corpus (documents.text itself carries no PII)."""
    d = load_table(spark, "documents", sf_dir)
    raw = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select("doc_id", redacted.alias("redacted"))


# --------------------------------------------------------------------------
# Split-leakage audit: near-dup pairs that cross train/val/test boundaries.
# --------------------------------------------------------------------------
from psql_streamer_spark.operators.dedup import (  # noqa: E402
    _SQL_MINHASH_LSH,
    dedup_minhash_lsh_pairs,
)

_SPLIT_CASE = (
    f"CASE WHEN {_B} < 80 THEN 'train' WHEN {_B} < 90 THEN 'val' "
    "ELSE 'test' END"
)


@register(
    "audit_split_leakage",
    oracle=f"""
    WITH pairs AS ({_SQL_MINHASH_LSH}),
    splits AS (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents)
    SELECT sa.split AS split_a, sb.split AS split_b,
           COUNT(*) AS n_pairs,
           CAST(COUNT(*) FILTER (WHERE sa.split <> sb.split) AS BIGINT)
             AS n_leaking
    FROM pairs
    JOIN splits sa ON sa.doc_id = doc_a
    JOIN splits sb ON sb.doc_id = doc_b
    GROUP BY 1, 2
    """,
)
def audit_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination check: a near-duplicate pair with one side in train
    and the other in val/test is evaluation leakage — the metric looks
    great because the model saw the answer. Composes the LSH pair miner
    with the deterministic split: pairs grouped by their sides' splits,
    cross-split pairs counted as leaking. The fix in a real pipeline is
    cluster-level splitting (assign dedup_lsh_clusters' cluster_id, not
    doc_id, to splits) — this query is the audit that proves you need it."""
    from psql_streamer_spark.sources.tables import load_table as _lt

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    d = _lt(spark, "documents", sf_dir)
    b = md5_bucket(F.col("doc_id"), 100)
    splits = d.select(
        "doc_id",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("split_a", "split_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count(F.when(F.col("split_a") != F.col("split_b"), 1)).alias(
                "n_leaking"
            ),
        )
    )


# --------------------------------------------------------------------------
# Sequence packing: contiguous token-budget fill per source — the batch
# builder for pretraining (pack short docs into fixed-size contexts).
# --------------------------------------------------------------------------
PACK_BUDGET_TOKENS = 512


@register(
    "mlprep_pack_sequences",
    oracle=f"""
    SELECT doc_id, source,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           CAST(FLOOR((SUM(len(ws)) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - len(ws)) / {PACK_BUDGET_TOKENS}.0) AS BIGINT) AS pack_id
    FROM (SELECT doc_id, source, {{ws}} AS ws FROM documents)
    """.format(ws="list_filter(string_split(lower(text), ' '), w -> len(w) > 0)"),
)
def mlprep_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contiguous fill: within each source (ordered by
    doc_id) a doc joins pack floor(preceding_tokens / budget) — every
    worker computes the same packing with no driver coordination, unlike
    greedy first-fit which is inherently sequential.

    Scale shape: ONE shuffle on source + a running-sum window. A skewed
    mega-source serializes its window into one task; the fix at 100 TB is
    hierarchical packing (salt the source into K sub-streams, pack within
    each) — same expression with a composite partition key."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.text_hash import words_expr

    d = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(words_expr())
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(n_tokens).over(w)
    return d.select(
        "doc_id",
        "source",
        n_tokens.cast("long").alias("n_tokens"),
        F.floor((cum - n_tokens) / F.lit(float(PACK_BUDGET_TOKENS))).alias(
            "pack_id"
        ),
    )


@register(
    "mlprep_pack_fill_audit",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id, source,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(FLOOR((SUM(len(ws)) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - len(ws)) / {PACK_BUDGET_TOKENS}.0) AS BIGINT) AS pack_id
      FROM (SELECT doc_id, source,
                   list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS ws
            FROM documents)
    )
    SELECT source, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY source, pack_id
    """,
)
def mlprep_pack_fill_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack doc count and token fill — the packing-quality audit. The
    contiguous-fill construction guarantees every pack except a source's
    last holds >= {PACK_BUDGET_TOKENS} tokens minus one document's
    overhang; this reaggregation makes that measurable (and is the shape
    a batch builder reads to plan padding). Pure reagg of the packing
    assignment — one extra map-side-combined aggregate."""
    packed = mlprep_pack_sequences(spark, sf_dir)
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


# -- packing on REAL tokenizer counts -------------------------------------
# The packers above budget on whitespace token counts — fine for relative
# fill, but a training batch builder budgets in TOKENIZER tokens. This
# tier re-bases the identical contiguous-fill construction on the trained
# BPE model's exact per-doc counts (text_bpe_encode_tokens' join path);
# docs the tokenizer yields nothing for (empty text) pack with 0 tokens
# rather than dropping out — a batch builder must place every doc.
from psql_streamer_spark.operators.text import (  # noqa: E402
    _SQL_BPE_TRAIN,
    _bpe_train,
)

_SQL_BPE_COUNTS = f"""
    , bpe_final AS (
      SELECT word, len(pieces) AS n_pieces
      FROM bpe
      WHERE kind = 'w' AND it = (SELECT MAX(it) FROM bpe WHERE kind = 'w')
    ),
    bpe_docwords AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                w -> len(w) > 0)) AS w
      FROM documents
    ),
    bpe_counts AS (
      SELECT d.doc_id, CAST(SUM(f.n_pieces) AS BIGINT) AS n_tokens
      FROM bpe_docwords d JOIN bpe_final f ON d.w = f.word
      GROUP BY d.doc_id
    )
"""


@register(
    "mlprep_pack_sequences_bpe",
    oracle=_SQL_BPE_TRAIN
    + _SQL_BPE_COUNTS
    + f"""
    SELECT doc.doc_id, doc.source,
           COALESCE(c.n_tokens, 0) AS n_tokens,
           CAST(FLOOR((SUM(COALESCE(c.n_tokens, 0))
                         OVER (PARTITION BY doc.source ORDER BY doc.doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - COALESCE(c.n_tokens, 0)) / {PACK_BUDGET_TOKENS}.0)
                AS BIGINT) AS pack_id
    FROM documents doc LEFT JOIN bpe_counts c ON doc.doc_id = c.doc_id
    """,
)
def mlprep_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mlprep_pack_sequences re-based on exact trained-BPE token counts:
    the same one-shuffle contiguous fill, budgeting what the model will
    actually consume. Token counts come from the broadcast join against
    the trained segmentation table (never a per-token merge loop); the
    oracle replays BPE training via the recursive CTE and the identical
    window."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.text_hash import with_words

    _, words = _bpe_train(spark, sf_dir)
    vocab = words.select("word", F.size("pieces").alias("n_pieces"))
    d = with_words(load_table(spark, "documents", sf_dir))
    counts = (
        d.select("doc_id", F.explode("__words").alias("w"))
        .join(F.broadcast(vocab), F.col("w") == F.col("word"))
        .groupBy("doc_id")
        .agg(F.sum("n_pieces").cast("bigint").alias("bpe_tokens"))
    )
    base = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "source")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("bpe_tokens", F.lit(0)).alias("n_tokens"),
        )
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(
            (cum - F.col("n_tokens")) / F.lit(float(PACK_BUDGET_TOKENS))
        ).alias("pack_id"),
    )


PACK_SALT_STREAMS = 8


@register(
    "mlprep_pack_sequences_salted",
    oracle=f"""
    SELECT doc_id, source,
           {sql_md5_bucket("doc_id", PACK_SALT_STREAMS)} AS salt,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           CAST(FLOOR((SUM(len(ws)) OVER (
                         PARTITION BY source, {sql_md5_bucket("doc_id", PACK_SALT_STREAMS)}
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - len(ws)) / {PACK_BUDGET_TOKENS}.0) AS BIGINT) AS pack_id
    FROM (SELECT doc_id, source, {{ws}} AS ws FROM documents)
    """.format(ws="list_filter(string_split(lower(text), ' '), w -> len(w) > 0)"),
)
def mlprep_pack_sequences_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (salted) sequence packing — the 100 TB shape.

    mlprep_pack_sequences' single window per source serializes a skewed
    mega-source into ONE task (its own documented scale-killer). Here each
    source is salted into {PACK_SALT_STREAMS} deterministic sub-streams
    (md5 of doc_id — retry/repartition-stable like every split in this
    module) and the running-sum window packs WITHIN (source, salt): the
    mega-source's window becomes K independent tasks, and a pack is
    addressed by the composite key (source, salt, pack_id). Packing
    quality cost is at most one under-filled pack per sub-stream — at a
    512-token budget that is noise against K-way parallelism.

    Plan shape: the window exchange hash-partitions on BOTH source and
    salt (plan-tested), so no single reducer owns a whole source."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.text_hash import words_expr

    d = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(words_expr())
    salt = md5_bucket(F.col("doc_id"), PACK_SALT_STREAMS)
    salted = d.select(
        "doc_id", "source", salt.alias("salt"), n_tokens.alias("nt")
    )
    w = (
        W.partitionBy("source", "salt")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("nt").over(w)
    return salted.select(
        "doc_id",
        "source",
        "salt",
        F.col("nt").cast("long").alias("n_tokens"),
        F.floor((cum - F.col("nt")) / F.lit(float(PACK_BUDGET_TOKENS))).alias(
            "pack_id"
        ),
    )


# --------------------------------------------------------------------------
# Source mixture weights: token-budget-aware sampling weights per source —
# the "data mixing" step between corpus curation and training. Weight
# alpha=0.5 (sqrt) upweights small sources relative to proportional
# sampling, the standard temperature-style rebalancing.
# Determinism: sqrt is correctly-rounded IEEE (safe cross-engine, unlike
# pow); the normalizing sum runs over per-source weights ROUNDED TO
# DECIMALS first, so the total is exact decimal arithmetic, not an
# order-dependent double sum.
# --------------------------------------------------------------------------
@register(
    "mlprep_source_mixture_weights",
    oracle="""
    WITH stats AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                      w -> len(w) > 0))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT *, CAST(ROUND(sqrt(n_tokens), 6) AS DECIMAL(24,6)) AS weight
      FROM stats
    )
    SELECT source, n_docs, n_tokens,
           CAST(weight AS DOUBLE) AS weight,
           ROUND(CAST(weight AS DOUBLE)
                 / CAST(SUM(weight) OVER () AS DOUBLE), 8) AS mix_share
    FROM w
    """,
)
def mlprep_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token counts and normalized sqrt-temperature sampling
    shares. The rollup is one map-side-combined aggregate over the corpus;
    the normalization is a window over the ~|sources| aggregate rows —
    driver-free, and the divide happens on decimal-rounded weights so both
    engines hash-match bit-for-bit."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.text_hash import words_expr

    d = load_table(spark, "documents", sf_dir)
    stats = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(words_expr())).cast("bigint").alias("n_tokens"),
    )
    weight = F.round(F.sqrt("n_tokens"), 6).cast("decimal(24,6)")
    w = stats.withColumn("weight", weight)
    total = F.sum("weight").over(W.partitionBy())
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.col("weight").cast("double").alias("weight"),
        F.round(
            F.col("weight").cast("double") / total.cast("double"), 8
        ).alias("mix_share"),
    )


# --------------------------------------------------------------------------
# Token-budget allocation: the step AFTER mixture weighting — turn a
# global training-token budget into per-source token/doc allocations
# (Pile/Dolma-style mixing). Integer-exact end to end: weights are
# floor(sqrt(tokens)) whole units (IEEE sqrt + floor is bit-identical
# cross-engine), the split is one integer multiply + floor-divide, so
# shares sum to <= budget with deterministic remainders — no float
# proration whose last ulp could differ per engine. epochs_over_source
# > 1 flags a small source the budget would repeat (the 4-epoch-style
# caps a mixing policy applies live downstream of this report).
# --------------------------------------------------------------------------
MIX_TOKEN_BUDGET = 10_000_000


@register(
    "mlprep_token_budget_allocation",
    oracle=f"""
    WITH stats AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                      w -> len(w) > 0))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT *, CAST(FLOOR(SQRT(n_tokens)) AS BIGINT) AS weight_units
      FROM stats
    ),
    a AS (
      SELECT *,
             CAST(({MIX_TOKEN_BUDGET} * weight_units)
                  // NULLIF(SUM(weight_units) OVER (), 0) AS BIGINT)
               AS allocated_tokens
      FROM w
    )
    SELECT source, n_docs, n_tokens, weight_units, allocated_tokens,
           ROUND(allocated_tokens * 1.0 / NULLIF(n_tokens, 0), 6)
             AS epochs_over_source,
           CAST((n_docs * allocated_tokens) // NULLIF(n_tokens, 0)
                AS BIGINT) AS n_docs_equivalent
    FROM a
    """,
)
def mlprep_token_budget_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source allocation of MIX_TOKEN_BUDGET training tokens under
    sqrt-temperature weights: available docs/tokens, the integer weight,
    the floor-divided token share, how many passes over the source that
    share implies (epochs_over_source — the up-sampling a small source
    would need), and the doc-count equivalent. One map-side-combined
    rollup + a window over ~|sources| rows; every allocation column is
    integer arithmetic (see banner), so the report hash-matches DuckDB
    exactly."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.text_hash import words_expr

    d = load_table(spark, "documents", sf_dir)
    stats = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(words_expr())).cast("bigint").alias("n_tokens"),
    )
    w = stats.withColumn(
        "weight_units", F.floor(F.sqrt("n_tokens")).cast("bigint")
    ).withColumn(
        "total_units", F.sum("weight_units").over(W.partitionBy())
    )
    a = w.withColumn(
        "allocated_tokens",
        F.expr(
            f"CAST(({MIX_TOKEN_BUDGET} * weight_units)"
            " div nullif(total_units, 0) AS BIGINT)"
        ),
    )
    return a.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight_units",
        "allocated_tokens",
        F.round(
            F.col("allocated_tokens") / F.expr("nullif(n_tokens, 0)"), 6
        ).alias("epochs_over_source"),
        F.expr(
            "CAST((n_docs * allocated_tokens) div nullif(n_tokens, 0)"
            " AS BIGINT)"
        ).alias("n_docs_equivalent"),
    )


# --------------------------------------------------------------------------
# Document chunking: docs longer than the context window split into
# overlapping word-window chunks — packing's complement (packing merges
# short docs; chunking splits long ones). One explode over computed chunk
# starts: narrow, shuffle-free, scan-bound.
# --------------------------------------------------------------------------
CHUNK_SIZE_WORDS = 128
CHUNK_STRIDE_WORDS = 96  # 32-word overlap preserves cross-boundary context


@register(
    "mlprep_chunk_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {CHUNK_STRIDE_WORDS} AS BIGINT) AS start_word,
           CAST(LEAST({CHUNK_SIZE_WORDS},
                      nw - i * {CHUNK_STRIDE_WORDS}) AS BIGINT) AS n_words
    FROM (
      SELECT doc_id, len(ws) AS nw,
             unnest(range(0, CAST(FLOOR((len(ws) + {CHUNK_STRIDE_WORDS} - 1)
                                        / {CHUNK_STRIDE_WORDS}) AS BIGINT))) AS i
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), w -> len(w) > 0)
                     AS ws
            FROM documents)
    )
    """,
)
def mlprep_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start_word, n_words) for sliding word windows of
    {CHUNK_SIZE_WORDS} with stride {CHUNK_STRIDE_WORDS}: chunk i covers
    words [i*stride, i*stride+size). Empty docs produce no chunks; the
    final chunk is short rather than padded (padding is the batch
    builder's concern). Deterministic integer arithmetic, identical on
    both engines."""
    from psql_streamer_spark.functions.text_hash import words_expr

    d = load_table(spark, "documents", sf_dir)
    nw = F.size(words_expr())
    n_chunks = F.floor(
        (nw + CHUNK_STRIDE_WORDS - 1) / F.lit(CHUNK_STRIDE_WORDS)
    ).cast("int")
    starts = F.when(
        nw > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select("doc_id", nw.alias("nw"), F.explode(starts).alias("i"))
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_id"),
            (F.col("i") * CHUNK_STRIDE_WORDS).cast("bigint").alias("start_word"),
            F.least(
                F.lit(CHUNK_SIZE_WORDS),
                F.col("nw") - F.col("i") * CHUNK_STRIDE_WORDS,
            ).cast("bigint").alias("n_words"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic training-order shuffle: reproducible global "random" order
# without a global sort. Training wants documents decorrelated from ingest
# order (source-contiguous batches skew gradients); md5 of the doc key is
# the shuffle, shards keep the ordering work distributed.
# --------------------------------------------------------------------------
SHUFFLE_SHARDS = 64


@register(
    "mlprep_shuffle_order",
    oracle=f"""
    SELECT doc_id,
           {sql_md5_bucket("doc_id", SHUFFLE_SHARDS)} AS shard,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY {sql_md5_bucket("doc_id", SHUFFLE_SHARDS)}
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                AS BIGINT) - 1 AS pos_in_shard
    FROM documents
    """,
)
def mlprep_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a (shard, pos_in_shard) training address:
    shard = md5 bucket, position = rank of the md5 hex within the shard.
    Readers stream shards round-robin for a fixed epoch order that is
    reproducible across runs/retries/engines (pure function of doc_id —
    the property rand(seed) loses under repartitioning).

    Scale shape: one hash-partitioned window per shard — {SHUFFLE_SHARDS}
    independent sort tasks over |corpus|/{SHUFFLE_SHARDS} rows each,
    never a single global ORDER BY (the driver-bottleneck range-partition
    sort a naive shuffle implementation hits at 100 TB)."""
    from pyspark.sql import Window as W

    d = load_table(spark, "documents", sf_dir)
    shard = md5_bucket(F.col("doc_id"), SHUFFLE_SHARDS)
    h = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("shard").orderBy(F.col("h"), F.col("doc_id"))
    return (
        d.select("doc_id", shard.alias("shard"), h.alias("h"))
        .withColumn("pos_in_shard", (F.row_number().over(w) - 1).cast("bigint"))
        .select("doc_id", "shard", "pos_in_shard")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap against a held-out eval set.
# Standard LLM-corpus hygiene (the reference has no analogue; engine scope
# per the north star): any training document sharing enough n-grams with a
# benchmark/eval document must be flagged before training.
#
# Scale design (100 TB): eval suites are small (MBs) at ANY corpus scale,
# so the benchmark n-gram set is a broadcast build side — the corpus-side
# grams stream map-only through the broadcast membership probe and then
# aggregate per doc_id with map-side combine. The corpus is never
# shuffled against itself; cost is ~one distinct + one aggregate.
# --------------------------------------------------------------------------
DECONTAM_K = 5  # 5-word grams; eval-overlap window (Brown et al. use 8-13
# for web-scale text; 5 suits the short synthetic docs)
DECONTAM_EVAL_SOURCE = "src19"  # held-out source standing in for a benchmark


def _sql_ngrams(ws: str, k: int) -> str:
    """DuckDB k-word grams over a word list (1-based slicing); empty when
    the doc has fewer than k words. Twin of functions.text_hash.shingles_expr."""
    join = " || ' ' || ".join(f"{ws}[i+{j}]" for j in range(k))
    return f"list_transform(range(1, len({ws}) - {k - 2}), i -> {join})"


@register(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, {ws} AS ws FROM documents WHERE source <> '{ev}'
    ),
    bench AS (
      SELECT {ws} AS ws FROM documents WHERE source = '{ev}'
    ),
    cg AS (
      SELECT DISTINCT doc_id, unnest({grams}) AS g FROM corpus
    ),
    bg AS (
      SELECT DISTINCT unnest({grams}) AS g FROM bench
    )
    SELECT cg.doc_id AS doc_id,
           COUNT(*) AS n_grams,
           COUNT(bg.g) AS n_shared,
           CAST(COUNT(bg.g) AS DOUBLE) / COUNT(*) AS contamination
    FROM cg LEFT JOIN bg ON cg.g = bg.g
    GROUP BY cg.doc_id
    """.format(
        ws="list_filter(string_split(lower(text), ' '), w -> len(w) > 0)",
        ev=DECONTAM_EVAL_SOURCE,
        grams=_sql_ngrams("ws", DECONTAM_K),
    ),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus document: distinct 5-gram count, how many of those grams
    also occur anywhere in the eval set, and the contamination ratio.
    Documents shorter than K words have no grams and drop out (both
    engines). Downstream filters on ``contamination`` to quarantine."""
    from psql_streamer_spark.functions.text_hash import shingles_expr, with_words

    d = with_words(load_table(spark, "documents", sf_dir))
    grams = shingles_expr(F.col("__words"), k=DECONTAM_K)
    corpus_grams = (
        d.filter(F.col("source") != DECONTAM_EVAL_SOURCE)
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    bench_grams = (
        d.filter(F.col("source") == DECONTAM_EVAL_SOURCE)
        .select(F.explode(grams).alias("bg"))
        .distinct()
    )
    return (
        corpus_grams.join(
            F.broadcast(bench_grams), F.col("g") == F.col("bg"), "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("bg").alias("n_shared"),
            (F.count("bg").cast("double") / F.count("*")).alias("contamination"),
        )
    )


# --------------------------------------------------------------------------
# Cluster-atomic split: near-dup clusters never straddle train/test.
# --------------------------------------------------------------------------
from psql_streamer_spark.operators.dedup import _SQL_LSH_CLUSTERS  # noqa: E402


@register(
    "split_cluster_atomic",
    oracle=f"""
    SELECT doc_id, cluster_id,
           CASE WHEN {sql_md5_bucket("cluster_id", 10)} < 8 THEN 'train'
                WHEN {sql_md5_bucket("cluster_id", 10)} = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM ({_SQL_LSH_CLUSTERS}) c
    """,
)
def split_cluster_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free 80/10/10 split at NEAR-DUP-CLUSTER granularity: the
    split key is the cluster's canonical id (min doc_id over the LSH
    near-dup component), so a document and all its near-duplicates land
    in the same partition by construction — the failure mode
    audit_split_leakage measures (train/test contamination through
    near-identical text) cannot occur. Per-doc hashing
    (split_train_val_test) cannot give this: two near-dup docs hash
    independently.

    Scale shape: reuses dedup_lsh_clusters (bucketed LSH pair mining +
    alternating-star components, both 100 TB-safe) and adds only a
    per-row hash — no new shuffle beyond the clustering itself."""
    from psql_streamer_spark.operators.dedup import dedup_lsh_clusters

    clusters = dedup_lsh_clusters(spark, sf_dir)
    b = md5_bucket(F.col("cluster_id"), 10)
    split = F.when(b < 8, "train").when(b == 8, "val").otherwise("test")
    return clusters.select("doc_id", "cluster_id", split.alias("split"))


# --------------------------------------------------------------------------
# Embedding-space decontamination: semantic twin of the n-gram overlap op.
# --------------------------------------------------------------------------
# N-gram decontamination misses paraphrased eval leakage; the standard
# complement (Phi/FineWeb-style) screens the corpus in EMBEDDING space:
# any training vector whose cosine against ANY benchmark vector clears a
# threshold is quarantined. Same broadcast shape as
# decontaminate_ngram_overlap: eval suites are constant-size at any corpus
# scale, so the benchmark vectors are the broadcast side and the corpus
# streams through once (map-side partial MAX, one vec_id shuffle).
#
# On the synthetic embeddings the "benchmark" stand-in is label == 9
# (~10% of rows, mirroring DECONTAM_EVAL_SOURCE on documents). That makes
# the synthetic cost |corpus| x |eval| — quadratic in sf — purely as a
# data-layout artifact, hence sample_scale=True; with a real constant-size
# eval suite the op is a single linear broadcast scan.
EMBED_DECONTAM_LABEL = 9
EMBED_DECONTAM_THRESHOLD = 0.4  # max inter-vector cosine in the synthetic
# table is ~0.51 (see dedup.COSINE_DUP_THRESHOLD) — 0.4 exercises both
# verdicts.

_SQL_EMBED_DECONTAM = f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    n AS (SELECT vec_id, label, e,
                 sqrt(list_reduce(list_transform(e, x -> x*x), (x,y) -> x+y)) AS nrm
          FROM v),
    ev AS (SELECT e, nrm FROM n WHERE label = {EMBED_DECONTAM_LABEL}),
    corpus AS (SELECT vec_id, e, nrm FROM n WHERE label <> {EMBED_DECONTAM_LABEL}),
    scored AS (
      SELECT c.vec_id,
             max(list_reduce(list_transform(range(1, len(c.e)+1),
                                            i -> c.e[i] * ev.e[i]), (x,y) -> x+y)
                 / (c.nrm * ev.nrm)) AS max_cosine
      FROM corpus c CROSS JOIN ev
      GROUP BY c.vec_id
    )
    SELECT vec_id, max_cosine,
           max_cosine >= {EMBED_DECONTAM_THRESHOLD} AS contaminated
    FROM scored
"""


@register(
    "decontaminate_embedding_cosine",
    oracle=_SQL_EMBED_DECONTAM,
    sample_scale=True,
)
def decontaminate_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus vector: max cosine against the benchmark vectors and the
    quarantine verdict at EMBED_DECONTAM_THRESHOLD. Cosines are exact
    sequential folds (F.aggregate / zip_with — the same summation order as
    DuckDB's list_reduce, so the doubles hash-match bit-for-bit; see
    dedup_embedding_cosine_pairs for the fold-vs-BLAS ulp note); MAX over
    bit-identical doubles is order-free, so the one shuffle (vec_id,
    map-side partial max) cannot perturb the result."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    # The battery side was always driver-materialized (F.broadcast collects
    # to the driver before shipping), so collecting it keeps the identical
    # bounded-model-state contract — but lets the O(corpus x battery) work
    # run as a NumPy column fold inside mapInPandas (r17, guide §4.2)
    # instead of materializing every pair as a BroadcastNestedLoopJoin row
    # just to reduce it away again: the old plan built |corpus|*|battery|
    # joined rows each carrying two 64-dim arrays (~1 KB/row) before the
    # per-pair expression even ran. Bit-exactness: the fold below adds
    # dimension i's product to the accumulator at step i — vectorized
    # ACROSS pairs, sequential ACROSS dims — which is the exact IEEE
    # addition order of the expression fold / DuckDB's list_reduce, so
    # every cosine double (and their max) is unchanged.
    ev_all = [
        r[0]
        for r in e.filter(F.col("label") == EMBED_DECONTAM_LABEL)
        .select("e")
        .collect()
    ]
    ev_rows = [x for x in ev_all if x is not None]
    verdict = (F.col("max_cosine") >= EMBED_DECONTAM_THRESHOLD).alias(
        "contaminated"
    )
    corpus = e.filter(F.col("label") != EMBED_DECONTAM_LABEL).select(
        "vec_id", "e"
    )
    if not ev_all:
        # crossJoin against an EMPTY battery produced zero rows pre-agg:
        # the legacy result is an empty frame, not per-vector NULLs
        empty = spark.createDataFrame([], "vec_id bigint, max_cosine double")
        return empty.select("vec_id", "max_cosine", verdict)
    if not ev_rows:
        # battery rows exist but every embedding is NULL: each pair's
        # cosine is NULL, and max over all-NULL is NULL — one row per
        # corpus vector with a NULL max_cosine (and NULL verdict)
        return corpus.select(
            "vec_id", F.lit(None).cast("double").alias("max_cosine"), verdict
        )
    if any(len(x) != len(ev_rows[0]) for x in ev_rows):
        raise ValueError(
            "decontaminate_embedding_cosine: battery vectors have mixed"
            " dims — fix the corpus (the fold would silently NULL-pad)"
        )
    bat = np.array(ev_rows, dtype=np.float64)
    dim = bat.shape[1]
    eacc = np.zeros(bat.shape[0])
    for i in range(dim):
        eacc += bat[:, i] * bat[:, i]
    enrm = np.sqrt(eacc)

    def _score(frames):
        for pdf in frames:
            es = pdf["e"]
            valid = es.notna().to_numpy()
            out: list = [None] * len(pdf)
            if valid.any():
                rows = es[valid].tolist()
                if any(len(x) != dim for x in rows):
                    raise ValueError(
                        "decontaminate_embedding_cosine: corpus vector dim"
                        f" != {dim}"
                    )
                a = np.array(rows, dtype=np.float64)
                acc = np.zeros((a.shape[0], bat.shape[0]))
                nacc = np.zeros(a.shape[0])
                for i in range(dim):
                    acc += a[:, i : i + 1] * bat[None, :, i]
                    nacc += a[:, i] * a[:, i]
                den = np.sqrt(nacc)[:, None] * enrm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = acc / den
                mx = np.max(cos, axis=1)  # NaN propagates = Spark's NaN-greatest
                # Spark's double ordering has -0.0 < +0.0; np.max returns the
                # FIRST of compare-equal zeros — promote to +0.0 when any
                # +0.0 cosine exists so a zero max keeps Spark's bit pattern
                neg0 = (mx == 0.0) & np.signbit(mx)
                if neg0.any():
                    pos0 = ((cos == 0.0) & ~np.signbit(cos)).any(axis=1)
                    mx = np.where(neg0 & pos0, 0.0, mx)
                vi = np.flatnonzero(valid)
                for j, m in zip(vi, mx):
                    out[j] = float(m)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "max_cosine": pd.Series(out, dtype=object)}
            )

    return corpus.mapInPandas(_score, "vec_id bigint, max_cosine double").select(
        "vec_id", "max_cosine", verdict
    )


# --------------------------------------------------------------------------
# Bloom-filter n-gram decontamination: the fixed-size-broadcast scale path.
# --------------------------------------------------------------------------
# decontaminate_ngram_overlap broadcasts the eval GRAM STRINGS — O(eval
# bytes) per executor, which a large eval battery (or a blocklist) can push
# into the hundreds of MB. The classic fix is a Bloom filter: the corpus
# probe side only ever sees a FIXED-SIZE bitmap (BLOOM_M_BITS/8 bytes —
# 8 KiB here — regardless of how many grams went in), at the price of a
# measured false-positive rate. Everything is deterministic so the DuckDB
# oracle replays the verdicts exactly: the k hash positions come from the
# md5-bucket idiom (seed || '|' || gram), the bitmap is just the SET of
# those positions, and "bloom_hit" == all k positions present in that set.
# The Spark side probes a REAL broadcast word-array bitmap (built once from the
# eval positions — a bounded driver collect of <= k * |eval grams| ints,
# the same bounded-model-state class as the k-means centroids); the oracle
# expresses the identical membership test relationally. Both columns land
# in one output so the false-positive rate is measured in-artifact:
# n_bloom_hits - n_exact_hits per document IS the FP count (Bloom filters
# have no false negatives — property-pinned in tests/test_decontam.py).
BLOOM_M_BITS = 65536  # 8 KiB bitmap; with sf0.1's ~11.5k eval grams and
# k=3 the theoretical FP rate is ~(1 - e^(-3n/m))^3 ~= 7% — big enough to
# observe, small enough to keep the probe useful.
#
# SIZING RULE (measured, DECONTAM_r12.json): a Bloom filter must be sized
# from the INSERT count, ~16 bits per eval gram for ~1% FP at k=3. The
# fixed 2^16 bitmap is correct for the registered op's sf0.01 battery
# (4.7% of bits set) but SATURATES under a 10x-grown battery: at 115k
# eval grams 99.5% of bits are set and the FP rate collapses the screen
# (2.3M bloom hits vs 10k exact). The helpers below take m_bits so a
# production pipeline re-sizes per battery (bloom_m_bits_for); the
# registered op keeps the constant because the oracle SQL embeds it.
BLOOM_K_HASHES = 3


def bloom_m_bits_for(n_grams: int, bits_per_gram: int = 16) -> int:
    """Next power of two >= bits_per_gram * n_grams (power of two keeps
    the word array aligned; 16 bits/elem at k=3 gives ~1% FP)."""
    m = 1 << max(0, (bits_per_gram * max(1, n_grams) - 1).bit_length())
    return max(m, 4096)


def _bloom_position(gram: Column, seed: int, m_bits: int = BLOOM_M_BITS) -> Column:
    """Deterministic bit position in [0, m_bits) for (seed, gram) — the
    md5-bucket idiom keyed by the seed-prefixed gram."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), gram)), 1, 8), 16, 10
        ).cast("bigint")
        % m_bits
    )


def _sql_bloom_position(
    gram_expr: str, seed: int, m_bits: int = BLOOM_M_BITS
) -> str:
    """DuckDB twin of :func:`_bloom_position` — same m_bits default so the
    two sides cannot silently desync when the constant is retuned."""
    return (
        f"CAST('0x' || substr(md5('{seed}' || '|' || {gram_expr}), 1, 8) AS BIGINT)"
        f" % {m_bits}"
    )


def build_bloom_words(positions, m_bits: int = BLOOM_M_BITS) -> list[int]:
    """Assemble the bitmap as 64-bit words: bit b lives in word b // 64 at
    bit index b % 64, wrapped to SIGNED 64-bit so the list round-trips as
    array<bigint>. The word-array representation is load-bearing: the
    first implementation shipped the bitmap as one hex STRING and probed
    it with substring(bitmap, pos, 1) — which is O(position) per call
    (UTF8String must walk bytes to map a code-point index), so the probe
    silently became O(corpus_grams * m_bits): 110 s for the 2^21-bit
    filter at sf1 vs 4.5 s for this form (DECONTAM_r12.json measured
    both). element_at on an array column + getbit are O(1) at any m."""
    words = [0] * (m_bits // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_words_df(spark: SparkSession, words: list[int]) -> DataFrame:
    """One-row frame carrying the bitmap; cross-joined broadcast so the
    words array ships once per executor (never per row, never inlined
    into the expression tree / generated code)."""
    return spark.createDataFrame([(words,)], "____bloom_words array<bigint>")


def _bloom_probe(
    gram: Column, words: Column, m_bits: int = BLOOM_M_BITS
) -> Column:
    """True iff all BLOOM_K_HASHES positions of the gram are set in the
    broadcast word-array bitmap. element_at + getbit only — O(1) per
    probe at any bitmap size, whole-stage codegen keeps it JVM-side."""
    hit = F.lit(True)
    for seed in range(BLOOM_K_HASHES):
        p = _bloom_position(gram, seed, m_bits)
        word = F.element_at(words, F.floor(p / 64).cast("int") + 1)
        hit = hit & (F.getbit(word, (p % 64).cast("int")) == F.lit(1))
    return hit


_BLOOM_WS = "list_filter(string_split(lower(text), ' '), w -> len(w) > 0)"
_BLOOM_MEMBERSHIP = " AND ".join(
    f"({_sql_bloom_position('cg.g', s)}) IN (SELECT p FROM pos)"
    for s in range(BLOOM_K_HASHES)
)
_SQL_BLOOM_DECONTAM = f"""
    WITH corpus AS (
      SELECT doc_id, {_BLOOM_WS} AS ws FROM documents
      WHERE source <> '{DECONTAM_EVAL_SOURCE}'
    ),
    bench AS (
      SELECT {_BLOOM_WS} AS ws FROM documents
      WHERE source = '{DECONTAM_EVAL_SOURCE}'
    ),
    cg AS (
      SELECT DISTINCT doc_id, unnest({_sql_ngrams("ws", DECONTAM_K)}) AS g
      FROM corpus
    ),
    bg AS (
      SELECT DISTINCT unnest({_sql_ngrams("ws", DECONTAM_K)}) AS g FROM bench
    ),
    pos AS (
      SELECT DISTINCT
        CAST('0x' || substr(md5(CAST(t.j AS VARCHAR) || '|' || g), 1, 8) AS BIGINT)
          % {BLOOM_M_BITS} AS p
      FROM bg, (VALUES {", ".join(f"({s})" for s in range(BLOOM_K_HASHES))}) t(j)
    ),
    probe AS (
      SELECT cg.doc_id,
             ({_BLOOM_MEMBERSHIP}) AS bloom_hit,
             cg.g IN (SELECT g FROM bg) AS exact_hit
      FROM cg
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           COUNT(*) FILTER (WHERE bloom_hit) AS n_bloom_hits,
           COUNT(*) FILTER (WHERE exact_hit) AS n_exact_hits
    FROM probe GROUP BY doc_id
"""


def _eval_bloom_positions(
    spark: SparkSession, sf_dir: str, m_bits: int = BLOOM_M_BITS
) -> list[int]:
    """Distinct bit positions of every benchmark gram under the k seeds —
    the Bloom filter's defining set. Bounded driver collect: at most
    BLOOM_K_HASHES * |eval grams| ints (eval suites are constant-size by
    definition; ~35k ints at sf0.1)."""
    from psql_streamer_spark.functions.text_hash import shingles_expr, with_words

    d = with_words(load_table(spark, "documents", sf_dir))
    bench_grams = (
        d.filter(F.col("source") == DECONTAM_EVAL_SOURCE)
        .select(F.explode(shingles_expr(F.col("__words"), k=DECONTAM_K)).alias("g"))
        .distinct()
    )
    pos = None
    for seed in range(BLOOM_K_HASHES):
        part = bench_grams.select(
            _bloom_position(F.col("g"), seed, m_bits).alias("p")
        )
        pos = part if pos is None else pos.unionByName(part)
    return [r.p for r in pos.distinct().collect()]


@register("decontaminate_bloom_ngrams", oracle=_SQL_BLOOM_DECONTAM)
def decontaminate_bloom_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus document: distinct 5-gram count, how many grams the
    8 KiB Bloom bitmap flags, and the exact membership count beside it —
    so every run measures its own false-positive overhead
    (n_bloom_hits - n_exact_hits; false negatives are impossible and
    pinned by test). The bloom column touches NO join: it is a pure
    broadcast word-array expression over the corpus gram stream, which is
    the 100 TB story — the probe cost is independent of eval size, and a
    grown eval battery only raises the FP rate (re-size BLOOM_M_BITS,
    never the probe). The exact column reuses the broadcast-gram join of
    decontaminate_ngram_overlap for the in-artifact comparison."""
    from psql_streamer_spark.functions.text_hash import shingles_expr, with_words

    words = build_bloom_words(_eval_bloom_positions(spark, sf_dir))

    d = with_words(load_table(spark, "documents", sf_dir))
    grams = shingles_expr(F.col("__words"), k=DECONTAM_K)
    corpus_grams = (
        d.filter(F.col("source") != DECONTAM_EVAL_SOURCE)
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    bench_grams = (
        d.filter(F.col("source") == DECONTAM_EVAL_SOURCE)
        .select(F.explode(grams).alias("bg"))
        .distinct()
    )
    probed = (
        corpus_grams.crossJoin(F.broadcast(bloom_words_df(spark, words)))
        .withColumn("bloom_hit", _bloom_probe(F.col("g"), F.col("____bloom_words")))
        .drop("____bloom_words")
        .join(F.broadcast(bench_grams), F.col("g") == F.col("bg"), "left")
    )
    return probed.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.count_if(F.col("bloom_hit")).alias("n_bloom_hits"),
        F.count("bg").alias("n_exact_hits"),
    )


# --------------------------------------------------------------------------
# Split drift audit: token-distribution shift between train and test.
# --------------------------------------------------------------------------
# audit_split_leakage catches near-dup contamination ACROSS splits; this op
# catches the other split pathology — distribution SHIFT: a test split
# whose token distribution drifts from train no longer measures the model
# on the training distribution. Per-token triangular-discrimination
# contribution (p-q)^2/(p+q) over relative frequencies, top-20 by
# contribution — the per-token form is what an operator actually acts on
# (which tokens moved), and it avoids the one non-deterministic step a
# global score would need (a float SUM over the vocabulary, whose result
# depends on partial-agg order).
#
# Determinism contract: counts are exact bigints; p and q are computed as
# double divisions and combined in a FIXED expression shape — every
# arithmetic step is a single IEEE754 operation both engines execute
# identically, so the drift doubles hash-match without decimal plumbing.
#
# Scale: one explode + one token aggregate (map-side combined) + a
# broadcast 1-row totals join + TakeOrdered top-20. No driver collect.

_SQL_SPLIT_DRIFT = f"""
    WITH tagged AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                w -> len(w) > 0)) AS token,
             CASE WHEN {_B} < 80 THEN 'train'
                  WHEN {_B} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    counts AS (
      SELECT token,
             COUNT(*) FILTER (WHERE split = 'train') AS c_train,
             COUNT(*) FILTER (WHERE split = 'test') AS c_test
      FROM tagged WHERE split <> 'val' GROUP BY token
    ),
    tot AS (
      SELECT CAST(SUM(c_train) AS DOUBLE) AS nt,
             CAST(SUM(c_test) AS DOUBLE) AS nx
      FROM counts
    )
    SELECT token, c_train, c_test,
           ((CAST(c_train AS DOUBLE) / nt) - (CAST(c_test AS DOUBLE) / nx))
             * ((CAST(c_train AS DOUBLE) / nt) - (CAST(c_test AS DOUBLE) / nx))
             / ((CAST(c_train AS DOUBLE) / nt) + (CAST(c_test AS DOUBLE) / nx))
             AS drift
    FROM counts, tot
    ORDER BY drift DESC, token LIMIT 20
"""


@register("audit_split_token_drift", oracle=_SQL_SPLIT_DRIFT)
def audit_split_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 drift tokens between the train and test splits: exact
    train/test counts plus the per-token triangular-discrimination
    contribution (p-q)^2/(p+q). Val rows are filtered before the token
    aggregate, so every output token has c_train + c_test >= 1 and the
    p+q denominator can never be zero."""
    from psql_streamer_spark.functions.text_hash import with_words

    d = with_words(load_table(spark, "documents", sf_dir))
    b = md5_bucket(F.col("doc_id"), 100)
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    tagged = d.select(
        F.explode(F.col("__words")).alias("token"), split.alias("split")
    ).filter(F.col("split") != "val")
    counts = tagged.groupBy("token").agg(
        F.count_if(F.col("split") == "train").alias("c_train"),
        F.count_if(F.col("split") == "test").alias("c_test"),
    )
    totals = counts.agg(
        F.sum("c_train").cast("double").alias("nt"),
        F.sum("c_test").cast("double").alias("nx"),
    )
    p = F.col("c_train").cast("double") / F.col("nt")
    q = F.col("c_test").cast("double") / F.col("nx")
    drift = (p - q) * (p - q) / (p + q)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select("token", "c_train", "c_test", drift.alias("drift"))
        .orderBy(F.col("drift").desc(), F.col("token"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Export shards + manifest: the pipeline's final hand-off to training.
# --------------------------------------------------------------------------
# A training run consumes the prepared corpus as N fixed shards plus a
# MANIFEST the trainer (and the auditor) can verify the delivery against:
# per-shard document count, token budget, and an order-free content hash.
# Shard assignment is the md5-bucket idiom — a pure function of doc_id, so
# re-exports, retries, and incremental appends land every document in the
# same shard forever. The content hash is BIT_XOR over a per-document
# 60-bit md5 prefix of (doc_id | text): commutative-associative, so it
# partial-aggregates map-side, is independent of row order and partition
# layout, and changes if ANY document's text or membership changes —
# exactly the "did the trainer read what the pipeline wrote" check.
# Consistency is pinned the other way around in
# tests/test_mlprep_export.py: physically writing the shards
# (partitionBy) and re-deriving the manifest FROM the written files must
# reproduce this query's rows bit-for-bit.
EXPORT_SHARDS = 16

_SQL_EXPORT_SHARDS = f"""
    SELECT {sql_md5_bucket("doc_id", 16)} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                    w -> len(w) > 0))) AS BIGINT) AS n_tokens,
           BIT_XOR(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                       1, 15) AS BIGINT)) AS content_hash
    FROM documents GROUP BY 1
"""


def export_manifest_columns():
    """The manifest aggregate set, shared by the registered query and the
    written-shard re-derivation in tests (one definition, two call
    sites — manifest-vs-data consistency is meaningful only if both
    sides compute the same thing)."""
    from psql_streamer_spark.functions.text_hash import words_expr

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return [
        F.count("*").alias("n_docs"),
        F.sum(F.size(words_expr())).cast("bigint").alias("n_tokens"),
        F.bit_xor(h).alias("content_hash"),
    ]


@register("mlprep_export_shards", oracle=_SQL_EXPORT_SHARDS)
def mlprep_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest for the EXPORT_SHARDS-way training hand-off:
    deterministic shard_id, document count, token budget, order-free
    content hash. One corpus pass, map-side partial aggregation, shard
    count is the only shuffle width."""
    d = load_table(spark, "documents", sf_dir)
    return (
        d.groupBy(md5_bucket(F.col("doc_id"), EXPORT_SHARDS).alias("shard_id"))
        .agg(*export_manifest_columns())
    )


# --------------------------------------------------------------------------
# End-to-end corpus-prep report: the pipeline stages composed in ONE query.
# --------------------------------------------------------------------------
# Every stage above is verified in isolation; a real corpus build runs them
# COMPOSED: quality gate -> exact dedup (canonical survivor) -> split
# assignment. This report is that composition as a single lineage frame —
# one row per terminal stage (dropped_quality, dropped_duplicate, train,
# val, test) with document and token counts, so the corpus build's
# attrition and the final per-split token budgets are one query. Every
# stage reuses the registered operator's exact semantics: the quality
# floor below, dedup_fingerprint's md5-of-lowered-text canonical-survivor
# rule, and split_train_val_test's md5 buckets — so the report cannot
# drift from the operators it summarizes.
#
# Scale: one corpus pass + one fingerprint-partition window (the dedup
# shuffle) + a final 5-group aggregate. No joins, no driver state.
PREP_MIN_WORDS = 20  # quality floor: shorter docs carry no trainable signal

_SQL_PREP_WS = "list_filter(string_split(lower(text), ' '), w -> len(w) > 0)"
_SQL_PREP_REPORT = f"""
    WITH scored AS (
      SELECT doc_id,
             len({_SQL_PREP_WS}) AS n_words,
             md5(concat_ws(' ', lower(text))) AS fp
      FROM documents
    ),
    staged AS (
      SELECT doc_id, n_words,
             CASE
               WHEN n_words < {PREP_MIN_WORDS} THEN 'dropped_quality'
               WHEN doc_id <> MIN(doc_id) FILTER (
                      WHERE n_words >= {PREP_MIN_WORDS})
                    OVER (PARTITION BY fp) THEN 'dropped_duplicate'
               WHEN {sql_md5_bucket("doc_id", 100)} < 80 THEN 'train'
               WHEN {sql_md5_bucket("doc_id", 100)} < 90 THEN 'val'
               ELSE 'test'
             END AS stage
      FROM scored
    )
    SELECT stage, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens
    FROM staged GROUP BY stage
"""


@register("pipeline_corpus_prep_report", oracle=_SQL_PREP_REPORT)
def pipeline_corpus_prep_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-attrition report of the composed corpus build: every document
    lands in exactly one terminal stage — dropped_quality (below the
    PREP_MIN_WORDS floor), dropped_duplicate (a quality-surviving doc
    whose fingerprint has a smaller surviving doc_id — the canonical-
    survivor rule, evaluated over quality survivors only so a dropped
    doc can never shield its duplicates), or its train/val/test split —
    with per-stage doc and token counts."""
    from psql_streamer_spark.functions.text_hash import with_words
    from pyspark.sql import Window

    d = with_words(load_table(spark, "documents", sf_dir))
    n_words = F.size(F.col("__words"))
    fp = F.md5(F.concat_ws(" ", F.lower(F.col("text"))))
    scored = d.select(
        "doc_id", n_words.alias("n_words"), fp.alias("fp")
    )
    survivor_min = F.min(
        F.when(F.col("n_words") >= PREP_MIN_WORDS, F.col("doc_id"))
    ).over(Window.partitionBy("fp"))
    b = md5_bucket(F.col("doc_id"), 100)
    stage = (
        F.when(F.col("n_words") < PREP_MIN_WORDS, "dropped_quality")
        .when(F.col("doc_id") != survivor_min, "dropped_duplicate")
        .when(b < 80, "train")
        .when(b < 90, "val")
        .otherwise("test")
    )
    return (
        scored.select("n_words", stage.alias("stage"))
        .groupBy("stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Full corpus-prep report: the composed lineage contract EXTENDED with the
# trained-model stages. pipeline_corpus_prep_report above predates the
# trained quality model — its gate is the heuristic word-count floor and
# it knows nothing of decontamination or score-proportional sampling.
# This is the r13-complete composition: trained model gate -> benchmark
# quarantine -> exact dedup (canonical survivor among gate survivors) ->
# quality-score-proportional sampling -> train/val/test split, with the
# eval battery itself reported as its own terminal stage (benchmark text
# is never training data). Every stage reuses the registered operator's
# EXACT semantics — text_quality_model_scores' predicted bit,
# decontaminate_bloom_ngrams' exact-hit verdict,
# dedup_fingerprint's md5-of-lowered-text canonical-survivor rule,
# mlprep_sample_by_quality's deterministic md5 coin, and
# split_train_val_test's md5 buckets — so the report cannot drift from
# the operators it summarizes, and every document lands in EXACTLY ONE
# terminal stage (pinned in tests).
#
# Scale: the model trains once (O(iters * dims), corpus-independent);
# scoring is a broadcast 66-weight join; the quarantine join is
# |corpus grams| x |battery grams| with the battery broadcast; dedup is
# one fingerprint-partition window; sampling and split are hash
# expressions. No stage is super-linear in the corpus.
# --------------------------------------------------------------------------
from psql_streamer_spark.operators.text import (  # noqa: E402
    _SQL_QM_P,
    _SQL_QM_TRAINED,
    QSAMPLE_BUCKETS,
)

_SQL_PREP_FULL = _SQL_QM_TRAINED + f""",
    qsc AS (
      SELECT doc_id, {_SQL_QM_P} AS score, ({_SQL_QM_P} >= 0.5) AS predicted
      FROM scorez
    ),
    prep_bg AS (
      SELECT DISTINCT unnest({_sql_ngrams("ws", DECONTAM_K)}) AS g
      FROM (SELECT {_BLOOM_WS} AS ws FROM documents
            WHERE source = '{DECONTAM_EVAL_SOURCE}')
    ),
    prep_contam AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, unnest({_sql_ngrams("ws", DECONTAM_K)}) AS g
            FROM (SELECT doc_id, {_BLOOM_WS} AS ws FROM documents
                  WHERE source <> '{DECONTAM_EVAL_SOURCE}'))
      WHERE g IN (SELECT g FROM prep_bg)
    ),
    prep_scored AS (
      SELECT d.doc_id,
             len({_SQL_PREP_WS}) AS n_words,
             md5(concat_ws(' ', lower(text))) AS fp,
             (d.source = '{DECONTAM_EVAL_SOURCE}') AS is_eval,
             q.score, q.predicted,
             d.doc_id IN (SELECT doc_id FROM prep_contam) AS contaminated
      FROM documents d JOIN qsc q USING (doc_id)
    ),
    prep_staged AS (
      SELECT doc_id, n_words,
        CASE
          WHEN is_eval THEN 'eval_battery'
          WHEN NOT predicted THEN 'rejected_model'
          WHEN contaminated THEN 'quarantined_contaminated'
          WHEN doc_id <> MIN(doc_id) FILTER (
                 WHERE NOT is_eval AND predicted AND NOT contaminated)
               OVER (PARTITION BY fp) THEN 'dropped_duplicate'
          WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 % {QSAMPLE_BUCKETS} >= FLOOR(score * {QSAMPLE_BUCKETS})
            THEN 'dropped_sampling'
          WHEN {sql_md5_bucket("doc_id", 100)} < 80 THEN 'train'
          WHEN {sql_md5_bucket("doc_id", 100)} < 90 THEN 'val'
          ELSE 'test'
        END AS stage
      FROM prep_scored
    )
    SELECT stage, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens
    FROM prep_staged GROUP BY stage
"""


@register("pipeline_corpus_prep_report_full", oracle=_SQL_PREP_FULL)
def pipeline_corpus_prep_report_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stage-attrition report of the FULL composed corpus build (see
    banner): eval_battery | rejected_model | quarantined_contaminated |
    dropped_duplicate | dropped_sampling | train | val | test — one row
    per terminal stage with doc and token counts, every document in
    exactly one stage."""
    from pyspark.sql import Window

    from psql_streamer_spark.functions.text_hash import with_words
    from psql_streamer_spark.operators.text import text_quality_model_scores

    d = with_words(load_table(spark, "documents", sf_dir))
    model = text_quality_model_scores(spark, sf_dir).select(
        "doc_id", "score", "predicted"
    )
    contam_ids = (
        decontaminate_bloom_ngrams(spark, sf_dir)
        .filter(F.col("n_exact_hits") > 0)
        .select("doc_id", F.lit(True).alias("contam"))
    )
    base = d.select(
        "doc_id",
        F.size("__words").alias("n_words"),
        F.md5(F.concat_ws(" ", F.lower(F.col("text")))).alias("fp"),
        (F.col("source") == DECONTAM_EVAL_SOURCE).alias("is_eval"),
    )
    j = (
        base.join(model, "doc_id")
        .join(contam_ids, "doc_id", "left")
        .withColumn("contaminated", F.coalesce("contam", F.lit(False)))
    )
    gate = ~F.col("is_eval") & F.col("predicted") & ~F.col("contaminated")
    survivor = F.min(F.when(gate, F.col("doc_id"))).over(
        Window.partitionBy("fp")
    )
    coin = md5_bucket(F.col("doc_id"), QSAMPLE_BUCKETS)
    thresh = F.floor(F.col("score") * QSAMPLE_BUCKETS)
    b = md5_bucket(F.col("doc_id"), 100)
    stage = (
        F.when(F.col("is_eval"), "eval_battery")
        .when(~F.col("predicted"), "rejected_model")
        .when(F.col("contaminated"), "quarantined_contaminated")
        .when(F.col("doc_id") != survivor, "dropped_duplicate")
        .when(coin >= thresh, "dropped_sampling")
        .when(b < 80, "train")
        .when(b < 90, "val")
        .otherwise("test")
    )
    return (
        j.select("n_words", stage.alias("stage"))
        .groupBy("stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Dataset card: the ONE-ROW summary a corpus build ships with (the
# "datasheet for datasets" practice) — total size, what each curation
# stage removed, and the final per-split token budgets. Pure aggregation
# of the full composed report, so it can never disagree with the lineage
# frame it summarizes; a scheduler diffs this row day-over-day to catch a
# curation regression (quarantine-rate spike, collapsed train share)
# before training consumes the output.
# --------------------------------------------------------------------------
_SQL_DATASET_CARD = f"""
    WITH rep AS ({_SQL_PREP_FULL})
    SELECT
      CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      CAST(COALESCE(SUM(n_docs) FILTER (WHERE stage = 'eval_battery'), 0)
           AS BIGINT) AS eval_docs,
      CAST(COALESCE(SUM(n_docs) FILTER (WHERE stage = 'rejected_model'), 0)
           AS BIGINT) AS rejected_model_docs,
      CAST(COALESCE(SUM(n_docs)
             FILTER (WHERE stage = 'quarantined_contaminated'), 0)
           AS BIGINT) AS quarantined_docs,
      CAST(COALESCE(SUM(n_docs) FILTER (WHERE stage = 'dropped_duplicate'), 0)
           AS BIGINT) AS duplicate_docs,
      CAST(COALESCE(SUM(n_docs) FILTER (WHERE stage = 'dropped_sampling'), 0)
           AS BIGINT) AS sampled_out_docs,
      CAST(COALESCE(SUM(n_docs) FILTER (WHERE stage = 'train'), 0)
           AS BIGINT) AS train_docs,
      CAST(COALESCE(SUM(n_docs) FILTER (WHERE stage = 'val'), 0)
           AS BIGINT) AS val_docs,
      CAST(COALESCE(SUM(n_docs) FILTER (WHERE stage = 'test'), 0)
           AS BIGINT) AS test_docs,
      CAST(COALESCE(SUM(n_tokens) FILTER (WHERE stage = 'train'), 0)
           AS BIGINT) AS train_tokens,
      CAST(COALESCE(SUM(n_tokens) FILTER (WHERE stage = 'val'), 0)
           AS BIGINT) AS val_tokens,
      CAST(COALESCE(SUM(n_tokens) FILTER (WHERE stage = 'test'), 0)
           AS BIGINT) AS test_tokens
    FROM rep
"""


@register("mlprep_dataset_card", oracle=_SQL_DATASET_CARD)
def mlprep_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card over the FULL composed corpus build (see
    banner): corpus totals, per-curation-stage attrition, final split
    budgets. Aggregates pipeline_corpus_prep_report_full's 8-row stage
    frame, so the card and the lineage report are definitionally
    consistent."""
    rep = pipeline_corpus_prep_report_full(spark, sf_dir)

    def stage(col: str, s: str, name: str):
        return (
            F.coalesce(
                F.sum(F.when(F.col("stage") == s, F.col(col))), F.lit(0)
            )
            .cast("bigint")
            .alias(name)
        )

    return rep.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        stage("n_docs", "eval_battery", "eval_docs"),
        stage("n_docs", "rejected_model", "rejected_model_docs"),
        stage("n_docs", "quarantined_contaminated", "quarantined_docs"),
        stage("n_docs", "dropped_duplicate", "duplicate_docs"),
        stage("n_docs", "dropped_sampling", "sampled_out_docs"),
        stage("n_docs", "train", "train_docs"),
        stage("n_docs", "val", "val_docs"),
        stage("n_docs", "test", "test_docs"),
        stage("n_tokens", "train", "train_tokens"),
        stage("n_tokens", "val", "val_tokens"),
        stage("n_tokens", "test", "test_tokens"),
    )


# --------------------------------------------------------------------------
# Source-interleaved training order: REALIZE the mixture weights as an
# actual epoch schedule. mlprep_source_mixture_weights /
# mlprep_token_budget_allocation report per-source SHARES; a trainer
# needs a concrete document ORDER in which sources appear at those
# rates, smoothly interleaved rather than in source-contiguous blocks
# (which skew gradients exactly like an unshuffled corpus). Classic
# stride scheduling in fixed-point integer arithmetic: document number
# r of source s is scheduled at virtual time floor(r * 2^20 / w_s), so
# a source with twice the weight appears twice as often in every prefix
# of the order, with bounded (one-doc) deviation from the ideal rate —
# the waterfall/"stride" discipline of lottery-scheduler fame applied
# to data mixing. Everything is BIGINT (the r1-comparable IEEE floor
# sqrt for the weights, then multiply + floor-divide), so both engines
# produce the identical total order and the identical positions.
#
# Scale shape (100 TB): per-source ranks come from the salted two-level
# idiom (mlprep_pack_sequences_salted's fix for the mega-source window:
# INTERLEAVE_SUB_STREAMS sub-windows per source + a broadcast offset
# join of the |sources| x subs count table). The GLOBAL position is
# never a single ORDER BY: virtual time is range-bucketed (span chosen
# from the aggregate weight total so a bucket holds ~INTERLEAVE_
# BUCKET_DOCS docs), per-bucket counts roll into exclusive offsets via
# a window over the ~N/4096-row bucket-count table, and position =
# bucket offset + rank within the bucket's own hash-partitioned window.
# Two doc-keyed exchanges total — one per window — and the bucket join
# feeds the bucket window without re-partitioning.
# --------------------------------------------------------------------------
INTERLEAVE_SUB_STREAMS = 64
INTERLEAVE_VT_SCALE = 1 << 20  # fixed-point virtual-time resolution
INTERLEAVE_BUCKET_DOCS = 4096  # target docs per global-position bucket
INTERLEAVE_COARSE_BUCKETS = 4096  # buckets per coarse prefix-sum group

_SUB = sql_md5_bucket("doc_id", INTERLEAVE_SUB_STREAMS)

_SQL_INTERLEAVE = f"""
    WITH nt AS (
      SELECT doc_id, source,
             len(list_filter(string_split(lower(text), ' '),
                             w -> len(w) > 0)) AS nt
      FROM documents
    ),
    stats AS (
      SELECT source,
             GREATEST(1, CAST(FLOOR(SQRT(CAST(SUM(nt) AS BIGINT)))
                              AS BIGINT)) AS weight_units
      FROM nt GROUP BY source
    ),
    r AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
                    PARTITION BY source
                    ORDER BY {_SUB}, md5(CAST(doc_id AS VARCHAR)), doc_id)
                  AS BIGINT) AS src_rank
      FROM nt
    ),
    v AS (
      SELECT r.doc_id, r.source, r.src_rank, s.weight_units,
             CAST((r.src_rank * {INTERLEAVE_VT_SCALE}) // s.weight_units
                  AS BIGINT) AS vt
      FROM r JOIN stats s USING (source)
    )
    SELECT doc_id, source, src_rank, weight_units, vt,
           CAST(ROW_NUMBER() OVER (ORDER BY vt, source, doc_id)
                AS BIGINT) - 1 AS position
    FROM v
"""


@register("mlprep_interleave_sources", oracle=_SQL_INTERLEAVE)
def mlprep_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stride-scheduled interleaving of the per-source
    document streams into one global training order (see banner): every
    document gets (src_rank, vt, position) where position is its slot in
    the epoch and sources appear at rates proportional to their sqrt-
    temperature weights in every prefix of the order. The within-source
    order is the md5 shuffle (retry/repartition-stable); the oracle's
    single ROW_NUMBER total order is reproduced exactly by the
    range-bucketed two-phase ranking."""
    return interleave_sources_frame(load_table(spark, "documents", sf_dir))


def interleave_sources_frame(d: DataFrame) -> DataFrame:
    """mlprep_interleave_sources' body over any (doc_id, source, text)
    frame — split out so the stride property (two planted sources with
    a 4:1 weight ratio interleave 4-to-1 in every prefix) and the exact
    brute-force order are pinned on planted frames in tests."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.text_hash import words_expr

    nt = d.select("doc_id", "source", F.size(words_expr()).alias("nt"))
    stats = nt.groupBy("source").agg(
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(F.sqrt(F.sum("nt").cast("bigint"))).cast("bigint"),
        ).alias("weight_units")
    )
    # Per-source rank, salted: sub-stream windows + broadcast offsets.
    sub = md5_bucket(F.col("doc_id"), INTERLEAVE_SUB_STREAMS)
    base = nt.select(
        "doc_id",
        "source",
        sub.alias("sub"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w_sub = W.partitionBy("source", "sub").orderBy("h", "doc_id")
    ranked = base.withColumn("rn_sub", F.row_number().over(w_sub))
    w_off = (
        W.partitionBy("source")
        .orderBy("sub")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        ranked.groupBy("source", "sub")
        .agg(F.count("*").alias("c"))
        .withColumn("off", F.coalesce(F.sum("c").over(w_off), F.lit(0)))
        .select("source", "sub", "off")
    )
    r = ranked.join(F.broadcast(offsets), ["source", "sub"]).select(
        "doc_id",
        "source",
        (F.col("off") + F.col("rn_sub")).cast("bigint").alias("src_rank"),
    )
    v = r.join(F.broadcast(stats), "source").withColumn(
        "vt",
        F.expr(
            f"CAST((src_rank * {INTERLEAVE_VT_SCALE}) div weight_units"
            " AS BIGINT)"
        ),
    )
    # Global position, two-phase: range-bucket vt, offset by exclusive
    # cumulative bucket counts, rank within the bucket's window.
    span_df = stats.agg(
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(
                f"CAST({INTERLEAVE_BUCKET_DOCS * INTERLEAVE_VT_SCALE}L"
                " div sum(weight_units) AS BIGINT)"
            ),
        ).alias("span")
    )
    b = v.crossJoin(F.broadcast(span_df)).withColumn(
        "bucket", F.expr("CAST(vt div span AS BIGINT)")
    )
    # Exclusive prefix-sum over the per-bucket counts, TWO-LEVEL so no
    # corpus-proportional frame flows through a single partition (r15
    # verdict #2: the old `W.orderBy("bucket")` ran the whole ~N/4096-row
    # bucket-count table through one WindowExec task). Level 1 sums
    # within a coarse group of INTERLEAVE_COARSE_BUCKETS buckets
    # (hash-partitioned by coarse id -> parallel); level 2 prefix-sums
    # the per-coarse totals, a frame another 4096x smaller (~N/16.7M
    # rows — ~60k rows at a trillion docs), where a single partition is
    # genuinely fine. boff = coarse_off + within_off is the identical
    # exclusive cumulative count, pure arithmetic refactor.
    bc = b.groupBy("bucket").agg(F.count("*").alias("bc")).withColumn(
        "coarse",
        F.expr(f"CAST(bucket div {INTERLEAVE_COARSE_BUCKETS} AS BIGINT)"),
    )
    w_within = (
        W.partitionBy("coarse").orderBy("bucket").rowsBetween(
            W.unboundedPreceding, -1
        )
    )
    w_coarse = W.orderBy("coarse").rowsBetween(W.unboundedPreceding, -1)
    coarse_off = (
        bc.groupBy("coarse")
        .agg(F.sum("bc").alias("cc"))
        .withColumn(
            "coarse_off", F.coalesce(F.sum("cc").over(w_coarse), F.lit(0))
        )
        .select("coarse", "coarse_off")
    )
    boff = (
        bc.withColumn(
            "within_off", F.coalesce(F.sum("bc").over(w_within), F.lit(0))
        )
        .join(F.broadcast(coarse_off), "coarse")
        .select(
            "bucket",
            (F.col("coarse_off") + F.col("within_off")).alias("boff"),
        )
    )
    w_in = W.partitionBy("bucket").orderBy("vt", "source", "doc_id")
    return (
        b.join(boff, "bucket")
        .withColumn(
            "position",
            (F.col("boff") + F.row_number().over(w_in) - 1).cast("bigint"),
        )
        .select(
            "doc_id", "source", "src_rank", "weight_units", "vt", "position"
        )
    )
