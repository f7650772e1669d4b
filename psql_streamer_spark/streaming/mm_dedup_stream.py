"""Streaming media near-duplicate detection: the ingest-time face of the
mm dedup pipeline — the binary-payload twin of streaming/dedup_stream.py.

Batch mining (operators/multimodal.mm_dedup_embedding) answers "what
perceptual near-dups exist in the corpus"; its incremental form probes a
MATERIALIZED posting table with an already-indexed delta. Production
ingest needs the third form — "is this BRAND-NEW payload a near-dup of
anything indexed" — answered at arrival. The shape:

- the corpus posting table (operators.multimodal.mm_bucket_index_table)
  carries (doc_id, skey, raw-histogram vector) bucketed on skey, plus a
  companion one-row MODEL table (n, S, planes) — new payloads must be
  signed under the index's own centering model or their buckets are
  meaningless (signature compatibility, the band-index contract);
- each micro-batch is histogrammed (the same Arrow-batched map the index
  was built from), centered and signed under the stored model, and
  screened bucket-locally against ONLY the buckets it touches (the index
  side is semi-joined down to the batch's skeys before anything moves);
- screened pairs take the exact raw-histogram cosine verify — vectors
  come from the batch frame and the postings themselves, so the corpus
  parquet is never read;
- alerts are (new_doc_id, corpus_doc_id, cosine) at MM_COSINE_DUP, with
  byte-identical payloads found with probability 1 (identical payload =>
  identical histogram => identical signature under the shared model).
  Scope of the guarantee: payloads under 2 bytes yield no bigram
  histogram and are skipped by the extractor — on BOTH the index and
  probe sides, exactly as the batch miner skips them — so a sub-2-byte
  payload is out of the near-dup domain entirely, never half-indexed.

Batch-internal pairs (two new near-copies in one micro-batch) are NOT
emitted — the same epoch granularity as the text probe; shrink
maxFilesPerTrigger to tighten it. Non-SQL-expressible as one query
(materialized index + model state + stream), so the surface is
pytest-verified (tests/test_streaming.py::test_streaming_mm_near_dup_alerts
pins alert parity against the batch miner's pairs for identical
payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psql_streamer_spark.streaming.sinks import EpochParquetSink

from psql_streamer_spark.operators.multimodal import (
    MM_COSINE_DUP,
    _mm_dot,
    _mm_hist_from,
    _mm_norm,
    _mm_signed_postings,
    mm_bucket_index_model,
    screen_delta_posts,
)


def batch_mm_postings(
    spark: SparkSession, batch_df: DataFrame, index_table: str
) -> DataFrame:
    """(doc_id, skey, e) postings for a (doc_id, payload) micro-batch,
    signed under ``index_table``'s stored centering model — the exact
    expressions mm_bucket_index_table built the corpus postings with."""
    n_docs, S, planes = mm_bucket_index_model(spark, index_table)
    return _mm_signed_postings(
        _mm_hist_from(batch_df), n_docs, S, planes
    ).select(
        "doc_id",
        F.concat_ws(
            "|",
            F.col("tbl").cast("string"),
            F.col("bucket").cast("string"),
        ).alias("skey"),
        "e",
    )


def probe_mm_bucket_index(
    spark: SparkSession, batch_df: DataFrame, index_table: str
) -> DataFrame:
    """One micro-batch of (doc_id, payload) against the posting table;
    returns verified (new_doc_id, corpus_doc_id, cosine) alerts.

    New doc_ids must be disjoint from indexed ids (the ingest contract
    every stream here shares). Cost: O(|batch| postings + members of the
    touched buckets) — the semi-join prunes the index scan to the batch's
    skeys before the screen, and the verify joins vectors carried by the
    batch frame and the postings (no corpus read)."""
    from psql_streamer_spark.operators.dedup import (
        touch_app_table_liveness,
    )

    touch_app_table_liveness(spark, index_table)  # see its docstring
    new_posts = batch_mm_postings(spark, batch_df, index_table)
    idx = spark.table(index_table)
    touched = new_posts.select("skey").distinct()
    idx_posts = idx.join(F.broadcast(touched), "skey", "semi").withColumn(
        "is_new", F.lit(False)
    )
    posts = idx_posts.select(
        "skey", "doc_id", "e", "is_new"
    ).unionByName(
        new_posts.select("skey", "doc_id", "e", F.lit(True).alias("is_new"))
    )
    new_ids = new_posts.select("doc_id").distinct()
    pairs = screen_delta_posts(posts)
    # orient (lo, hi) pairs to (new, corpus) and drop batch-internal
    # pairs: exactly one side must be a batch doc
    a_new = new_ids.withColumnRenamed("doc_id", "doc_a").withColumn(
        "a_is_new", F.lit(True)
    )
    b_new = new_ids.withColumnRenamed("doc_id", "doc_b").withColumn(
        "b_is_new", F.lit(True)
    )
    oriented = (
        pairs.join(F.broadcast(a_new), "doc_a", "left")
        .join(F.broadcast(b_new), "doc_b", "left")
        .withColumn("a_is_new", F.coalesce("a_is_new", F.lit(False)))
        .withColumn("b_is_new", F.coalesce("b_is_new", F.lit(False)))
        .filter(F.col("a_is_new") != F.col("b_is_new"))
        .select(
            F.when(F.col("a_is_new"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("new_doc_id"),
            F.when(F.col("a_is_new"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("corpus_doc_id"),
        )
    )
    nv = new_posts.select(
        F.col("doc_id").alias("new_doc_id"), F.col("e").alias("ea")
    ).dropDuplicates(["new_doc_id"]).withColumn("na", _mm_norm(F.col("ea")))
    cv = (
        idx_posts.select(
            F.col("doc_id").alias("corpus_doc_id"), F.col("e").alias("eb")
        )
        .dropDuplicates(["corpus_doc_id"])
        .withColumn("nb", _mm_norm(F.col("eb")))
    )
    cosine = _mm_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        oriented.join(F.broadcast(nv), "new_doc_id")
        .join(cv, "corpus_doc_id")
        .select("new_doc_id", "corpus_doc_id", cosine.alias("cosine"))
        .filter(F.col("cosine") >= MM_COSINE_DUP)
    )


def start_mm_near_dup_stream(
    spark: SparkSession,
    source_dir: str,
    index_table: str,
    alert_sink_dir: str,
    checkpoint_dir: str,
):
    """readStream over a payload drop-dir (JSON rows carrying base64 is
    overkill here; the test feeds text re-encoded like _media_frame) ->
    per-batch posting-table probe -> per-epoch parquet alert sink.
    Returns the StreamingQuery (caller stops it)."""
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(source_dir)
    )

    sink = EpochParquetSink(alert_sink_dir, name="mm_dedup_alerts")

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        media = batch_df.select(
            "doc_id", F.encode("text", "utf-8").alias("payload")
        )
        alerts = probe_mm_bucket_index(spark, media, index_table)
        # at-least-once retry safety: EpochParquetSink's epoch-overwrite
        sink.write(alerts, epoch_id)

    return (
        stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
