"""Streaming throughput benchmark: events/sec through the CDC hot path.

The reference is a streaming pipe — its whole job is moving decoded WAL
events from a source loop into Kafka batches (hot path
source/postgres/postgres.go:298-355 -> mux/mux.go:169-203 ->
sink/kafka/kafka.go:257-287). The batch query benches measure our
relational surface; this one measures the streaming engine itself: raw
JSON lines -> decode_cdc_json -> validate -> route (table->topic) ->
fan-out to the epoch-idempotent parquet sink, through ``CdcPipeline``'s
foreachBatch with checkpointed offsets.

Config points mirror the mux's batching knobs (mux/mux.go:57-59:
batchSize default 100, batchFlushInterval 1 s):

- ``ref_batch100`` / ``ref_batch400``: source files of exactly 100/400
  events, maxFilesPerTrigger=1, so every micro-batch is the reference's
  batchSize. On a SATURATED source (full backlog, which is what a
  throughput bench is) the 1 s flush interval never binds — the mux
  flushes on size first; flush-on-timer only shapes an idle trickle — so
  batches fire back-to-back under availableNow, and the per-batch wall
  time IS the size-capped batch latency.
- ``bulk_drain_1m``: 1M events in 64 files, 8 files per trigger — the
  micro-batch size a Spark deployment would actually run (per-batch
  overhead amortized over ~125k events). This is the headline
  events/sec.

Payloads are sf0.1-scale orders rows (9 columns, ~340 bytes of wire
JSON per event). Prints ONE JSON line; ``SPARK_GRAFT_STREAM_OUT`` also
writes it to a file.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _env_snapshot  # noqa: E402  (shared contention snapshot)

TOPIC_MAPPING = {f"tbl_{i}": f"topic_{i}" for i in range(4)}


def _generate_events(spark, path: str, n: int, events_per_file: int) -> int:
    """Write n wire-format CDC JSON lines as ceil(n/events_per_file) text
    files. Generation is Spark-side (to_json over range — no driver loop);
    payload is a realistic orders row in the dynamic Columns map."""
    from pyspark.sql import functions as F

    n_files = max(1, (n + events_per_file - 1) // events_per_file)
    df = spark.range(n).select(
        F.to_json(
            F.struct(
                F.lit("db1").alias("Host"),
                F.lit("bench").alias("Database"),
                F.concat(F.lit("tbl_"), (F.col("id") % 4).cast("string")).alias(
                    "Table"
                ),
                F.element_at(
                    F.array(F.lit("insert"), F.lit("update"), F.lit("delete")),
                    ((F.col("id") % 3) + 1).cast("int"),
                ).alias("Action"),
                F.col("id").alias("WALPosition"),
                F.lit("2026-01-01T00:00:00Z").alias("Timestamp"),
                F.md5(F.col("id").cast("string")).alias("UUID"),
                F.create_map(
                    F.lit("o_orderkey"), F.col("id").cast("string"),
                    F.lit("o_custkey"), (F.col("id") % 15000).cast("string"),
                    F.lit("o_orderstatus"), F.lit("O"),
                    F.lit("o_totalprice"), F.lit("172799.49"),
                    F.lit("o_orderdate"), F.lit("1996-01-02"),
                    F.lit("o_orderpriority"), F.lit("5-LOW"),
                    F.lit("o_clerk"), F.lit("Clerk#000000951"),
                    F.lit("o_shippriority"), F.lit("0"),
                    F.lit("o_comment"),
                    F.lit("final packages sleep furiously regular requests"),
                ).alias("Columns"),
            )
        ).alias("value")
    )
    df.repartition(n_files).write.mode("overwrite").text(path)
    return n_files


def _run_config(
    spark, work: str, name: str, n: int, events_per_file: int, files_per_trigger: int
) -> dict:
    from psql_streamer_spark.streaming.pipeline import CdcPipeline
    from psql_streamer_spark.streaming.sinks import EpochParquetSink

    src = os.path.join(work, name, "src")
    ckpt = os.path.join(work, name, "ckpt")
    out = os.path.join(work, name, "out")
    _generate_events(spark, src, n, events_per_file)

    batch_times: list[float] = []

    class TimedPipeline(CdcPipeline):
        def _process_batch(self, batch_df, batch_id):
            t0 = time.time()
            super()._process_batch(batch_df, batch_id)
            batch_times.append(time.time() - t0)

    pipe = TimedPipeline(
        spark,
        source_path=src,
        checkpoint_dir=ckpt,
        sinks=[EpochParquetSink(out)],
        topic_mapping=dict(TOPIC_MAPPING),
        topic_fallback="topic_other",
        max_files_per_trigger=files_per_trigger,
    )
    t0 = time.time()
    pipe.run_to_completion()
    wall = time.time() - t0
    assert pipe.stats.events_in == n, (pipe.stats.events_in, n)
    assert pipe.stats.events_routed == n, pipe.stats.as_line()
    lat_ms = sorted(t * 1000 for t in batch_times)
    return {
        "events": n,
        "events_per_batch": events_per_file * files_per_trigger,
        "batches": pipe.stats.batches,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n / wall, 1),
        "batch_latency_ms": {
            "p50": round(statistics.median(lat_ms), 1),
            "mean": round(statistics.fmean(lat_ms), 1),
            "max": round(lat_ms[-1], 1),
        },
    }


def main() -> None:
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.warmup import warm_expression_paths

    env_before = _env_snapshot()
    cpus = os.cpu_count() or 1
    contended = env_before.get("loadavg_1m", 0.0) > cpus / 2

    spark = get_spark("bench_stream")
    warm_expression_paths(spark)

    work = tempfile.mkdtemp(prefix="cdc_stream_bench_")
    try:
        configs = {
            # mux batchSize=100 / 400 analogues (saturated source: size cap
            # binds, 1 s flush cap never fires — see module banner)
            "ref_batch100": _run_config(spark, work, "ref_batch100", 8_000, 100, 1),
            "ref_batch400": _run_config(spark, work, "ref_batch400", 32_000, 400, 1),
            # deployment-shaped micro-batches over 1M events
            "bulk_drain_1m": _run_config(
                spark, work, "bulk_drain_1m", 1_000_000, 15_625, 8
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    result = {
        "metric": "cdc_stream_events_per_sec",
        "value": configs["bulk_drain_1m"]["events_per_sec"],
        "unit": "events/sec",
        "configs": configs,
        "contended": contended,
        "env_before": env_before,
        "env_after": _env_snapshot(),
    }
    line = json.dumps(result)
    print(line)
    out = os.environ.get("SPARK_GRAFT_STREAM_OUT")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
