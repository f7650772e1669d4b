"""The streaming CDC pipeline: source → decode → validate → route → fan-out.

This is the Spark-native re-expression of the reference's whole runtime
(SURVEY.md §3.2-3.3):

  raw CDC JSON stream          ← pgoutput/Kafka fetch loop
  decode_cdc_json              ← generateEvent / json.Unmarshal
  validate_split → DLQ         ← malformed/commit-and-skip (T5)
  route (table→topic)          ← generateBatches (R1/R2)
  with_default_key, serialize  ← key gen + passthrough handler (T6/T7)
  ONE foreachBatch → N sinks   ← mux fan-out, ACK-all-then-commit (R4/B3)
  checkpointLocation           ← BoltDB WAL-position store (F1/F2)
  trigger(...)                 ← mux batchSize/batchFlushInterval (B1)

Delivery semantics: the micro-batch's source offsets commit to the
checkpoint only after foreachBatch returns, i.e. after EVERY sink accepted
the batch — the reference's all-sinks-or-nothing ACK (mux/mux.go:173-189).
A sink failure fails the epoch; the whole batch is retried; sinks that
already wrote see it twice → at-least-once, same caveat the reference
documents (README.md:58), with the per-event UUID enabling downstream
dedup (F5).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psql_streamer_spark.routing import topic_expr
from psql_streamer_spark.streaming.sinks import Sink
from psql_streamer_spark.transforms import (
    decode_cdc_json,
    filter_dml,
    serialize_passthrough,
    validate_split,
    with_default_key,
)


@dataclass
class PipelineStats:
    """Driver-side counters, mirroring the reference's per-object atomic
    stats (O1). Updated inside foreachBatch (single thread per query)."""

    batches: int = 0
    events_in: int = 0
    events_valid: int = 0
    events_dlq: int = 0
    events_routed: int = 0
    events_discarded: int = 0
    sink_errors: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def as_line(self) -> str:
        return (
            f"batches {self.batches} in {self.events_in} valid "
            f"{self.events_valid} dlq {self.events_dlq} routed "
            f"{self.events_routed} discarded {self.events_discarded} "
            f"sinkErrors {self.sink_errors}"
        )


class CdcPipeline:
    """File-source CDC pipeline (JSON lines). Kafka differs only in the
    reader options — the transform chain and fan-out are identical.

    Batching knobs map to the mux's (B1):
      max_files_per_trigger ~ batchSize (size-capped batches)
      processing_interval   ~ batchFlushInterval (time-capped batches)
    Restart-from-checkpoint covers F1/F2; `available_now` drains the
    backlog and stops (flush-on-close).
    """

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        checkpoint_dir: str,
        sinks: list[Sink],
        topic_mapping: dict[str, str] | None = None,
        topic_fallback: str | None = None,
        dlq_sink: Sink | None = None,
        dml_only: bool = True,
        max_files_per_trigger: int | None = None,
        processing_interval: str | None = None,
    ):
        if not sinks:
            raise ValueError("at least one sink required (config.go:98-110)")
        self.spark = spark
        self.source_path = source_path
        self.checkpoint_dir = checkpoint_dir
        self.sinks = list(sinks)
        self.topic_mapping = dict(topic_mapping or {})
        self.topic_fallback = topic_fallback
        self.dlq_sink = dlq_sink
        self.dml_only = dml_only
        self.max_files_per_trigger = max_files_per_trigger
        self.processing_interval = processing_interval
        self.stats = PipelineStats()
        self.query = None

    # -- the per-epoch body (the mux flush) --------------------------------
    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # one materialization serves every branch (mux buffer reuse, B2)
        batch_df = batch_df.persist()
        try:
            n_in = batch_df.count()
            decoded = decode_cdc_json(batch_df)
            valid, dlq = validate_split(decoded)
            if self.dml_only:
                valid = filter_dml(valid)
            routed = valid.withColumn(
                "topic", topic_expr(self.topic_mapping, self.topic_fallback)
            )
            deliverable = routed.filter(F.col("topic").isNotNull()).persist()
            out = serialize_passthrough(with_default_key(deliverable))

            n_dlq = dlq.count()
            n_routed = deliverable.count()
            n_valid = valid.count()

            if self.dlq_sink is not None and n_dlq:
                self.dlq_sink.write(dlq, batch_id)

            # fan-out: every sink gets the batch; any failure aborts the
            # epoch BEFORE offsets commit (all-or-nothing ACK)
            for sink in self.sinks:
                try:
                    sink.write(out, batch_id)
                except Exception:
                    with self.stats._lock:
                        self.stats.sink_errors += 1
                    raise

            with self.stats._lock:
                self.stats.batches += 1
                self.stats.events_in += n_in
                self.stats.events_valid += n_valid
                self.stats.events_dlq += n_dlq
                self.stats.events_routed += n_routed
                self.stats.events_discarded += n_valid - n_routed
        finally:
            batch_df.unpersist()

    # -- lifecycle ---------------------------------------------------------
    def start(self, available_now: bool = False):
        reader = (
            self.spark.readStream.format("text")
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        raw = reader.load(self.source_path)

        writer = (
            raw.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif self.processing_interval:
            writer = writer.trigger(processingTime=self.processing_interval)
        self.query = writer.start()
        return self.query

    def run_to_completion(self) -> None:
        """Drain everything currently in the source, then stop — the test
        harness's synchronous mode (and the reference's shutdown flush,
        main.go:59-96)."""
        q = self.start(available_now=True)
        q.awaitTermination()
        self.query = None
