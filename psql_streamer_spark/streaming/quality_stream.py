"""Streaming model-based quality gate: the ingest-time face of
text_quality_model_scores.

Batch scoring answers "how does the trained quality model judge the
corpus"; production ingest needs the continuous form — "does this NEW
document clear the quality bar" — answered at arrival, before the
document enters the training corpus. The shape:

- the model is TRAINED ONCE on the existing corpus (operators.text's
  fixed-point deterministic trainer) and its 66 integer weights ride into
  every micro-batch as a broadcast frame — model state, never data;
- each micro-batch of (doc_id, text) is featurized with the IDENTICAL
  expressions the trainer used (_qm_features_from: normalized hashed TF,
  capped length, bias) and scored through the shared qm_score_features
  path, so a doc scores the same at ingest as it would in the batch query
  (parity pinned by tests/test_streaming.py::test_streaming_quality_gate);
- verdicts carry both the model score and the heuristic label, so the
  disagreement rows (model rejects what the rules pass, or vice versa)
  form the review queue a curation team actually reads.

Mirrors streaming/dedup_stream.py's / decontam_stream.py's
handler-over-micro-batch framing (reference: streamer/streamer.go handler
chain). Non-SQL-expressible as one query (trained model state + stream),
so the surface is pytest-verified rather than oracle-registered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from psql_streamer_spark.operators.text import (
    _qm_features_from,
    qm_score_features,
)


def score_quality_batch(
    spark: SparkSession, batch_df: DataFrame, w: list[int]
) -> DataFrame:
    """One micro-batch of (doc_id, text) under frozen weights ``w``;
    returns (doc_id, label, score, predicted, correct). Cost is
    O(|batch| tokens): featurize, broadcast-join 66 weights, one per-doc
    aggregate — never touches the corpus."""
    return qm_score_features(spark, _qm_features_from(batch_df), w)


def start_quality_stream(
    spark: SparkSession,
    source_dir: str,
    w: list[int],
    verdict_sink_dir: str,
    checkpoint_dir: str,
):
    """readStream over a document drop-dir -> per-batch model scoring ->
    parquet verdict sink. Returns the StreamingQuery (caller stops it)."""
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(source_dir)
    )

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch is at-least-once: a retried epoch must REPLACE its
        # prior (possibly committed) output, not append a duplicate set of
        # verdicts. Same epoch=<id>/overwrite idiom as EpochParquetSink;
        # readers of the sink dir get `epoch` via partition discovery.
        verdicts = score_quality_batch(spark, batch_df, w)
        verdicts.write.mode("overwrite").parquet(
            f"{verdict_sink_dir}/epoch={epoch_id:012d}"
        )

    return (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
