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
    spark, work: str, name: str, n: int, events_per_file: int,
    files_per_trigger: int, sink_factory=None,
) -> dict:
    from psql_streamer_spark.streaming.pipeline import CdcPipeline
    from psql_streamer_spark.streaming.sinks import EpochParquetSink

    src = os.path.join(work, name, "src")
    ckpt = os.path.join(work, name, "ckpt")
    out = os.path.join(work, name, "out")
    _generate_events(spark, src, n, events_per_file)

    batch_times: list[float] = []
    batch_sizes: list[int] = []

    class TimedPipeline(CdcPipeline):
        def _process_batch(self, batch_df, batch_id):
            before = self.stats.events_in
            t0 = time.time()
            super()._process_batch(batch_df, batch_id)
            batch_times.append(time.time() - t0)
            batch_sizes.append(self.stats.events_in - before)

    pipe = TimedPipeline(
        spark,
        source_path=src,
        checkpoint_dir=ckpt,
        sinks=[sink_factory(out) if sink_factory else EpochParquetSink(out)],
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
    sizes = sorted(batch_sizes)
    return {
        "events": n,
        # nominal: repartition(n_files) is round-robin and only
        # approximately balances rows across files (r6 advice), so the
        # mux-batchSize analogy is approximate; the measured per-batch
        # event counts (diffed off the pipeline's own n_in accounting,
        # zero extra actions) are the real distribution
        "events_per_batch_nominal": events_per_file * files_per_trigger,
        "events_per_batch_measured": {
            "min": sizes[0],
            "p50": int(statistics.median(sizes)),
            "max": sizes[-1],
        },
        "batches": pipe.stats.batches,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n / wall, 1),
        "batch_latency_ms": {
            "p50": round(statistics.median(lat_ms), 1),
            "mean": round(statistics.fmean(lat_ms), 1),
            "max": round(lat_ms[-1], 1),
        },
    }


def _run_neardup_config(
    spark, work: str, sf_dir: str, docs_per_file: int, files_per_trigger: int
) -> dict:
    """Ingest-time near-dup alerting throughput: the most expensive
    per-event operator the streaming path owns (r6 verdict task #6).

    The corpus band index is materialized ONCE (build time reported
    separately — it is the ingest-amortized cost, not per-event), then
    the sf0.1 documents table streams through the drop-dir source and
    every micro-batch runs the full sign -> band -> bucket-local index
    probe -> exact-Jaccard verify -> parquet alert write
    (streaming/dedup_stream.probe_band_index). docs/sec here is the
    events/sec of a pipeline that screens every arriving document
    against a 100 TB-shaped corpus index."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.dedup import band_index_table
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.dedup_stream import probe_band_index

    t0 = time.time()
    index_table = band_index_table(spark, sf_dir)
    index_build_sec = time.time() - t0

    corpus = load_table(spark, "documents", sf_dir)
    tag = f"neardup_{docs_per_file}x{files_per_trigger}"
    src = os.path.join(work, tag, "src")
    ckpt = os.path.join(work, tag, "ckpt")
    out = os.path.join(work, tag, "out")
    docs = corpus.select("doc_id", "text")
    n = docs.count()
    n_files = max(1, (n + docs_per_file - 1) // docs_per_file)
    docs.repartition(n_files).write.mode("overwrite").json(src)

    batch_times: list[float] = []
    batch_sizes: list[int] = []

    def _probe(batch_df, epoch_id):
        # persist + count materializes the decoded batch ONCE: the count
        # is batch-size accounting, and caching it means the probe reads
        # the decoded frame instead of re-decoding the JSON — the wall
        # window pays one decode total, so the headline events/sec is not
        # deflated by the accounting action (it previously re-read every
        # batch's input inside the timed window)
        batch_df.persist()
        batch_sizes.append(batch_df.count())
        t0 = time.time()
        alerts = probe_band_index(spark, batch_df, index_table, corpus, 0.8)
        alerts.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)
        batch_times.append(time.time() - t0)
        batch_df.unpersist()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .json(src)
    )
    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    n_alerts = spark.read.parquet(out).count() if batch_times else 0
    # both guards or neither: a zero-batch stream (empty source dir) must
    # yield a well-formed record, not an IndexError on sizes[0]
    lat_ms = sorted(t * 1000 for t in batch_times) or [0.0]
    sizes = sorted(batch_sizes) or [0]
    return {
        "events": n,
        "events_per_batch_nominal": docs_per_file * files_per_trigger,
        "events_per_batch_measured": {
            "min": sizes[0],
            "p50": int(statistics.median(sizes)),
            "max": sizes[-1],
        },
        "batches": len(batch_times),
        "index_build_sec": round(index_build_sec, 3),
        "alerts": n_alerts,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n / wall, 1),
        "batch_latency_ms": {
            "p50": round(statistics.median(lat_ms), 1),
            "mean": round(statistics.fmean(lat_ms), 1),
            "max": round(lat_ms[-1], 1),
        },
    }



def _run_decontam_config(
    spark, work: str, sf_dir: str, docs_per_file: int, files_per_trigger: int
) -> dict:
    """Ingest-time contamination gating throughput (r12): every arriving
    document's grams probe the broadcast battery bitmap and bloom hits
    feed the exact verify join (streaming/decontam_stream.
    probe_contamination). The battery bitmap + bench grams are built ONCE
    (battery_build_sec — amortized across every batch that reuses them,
    like the near-dup index); docs/sec is the events/sec of a pipeline
    that gates every arriving document against the eval battery."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.functions.text_hash import shingles_expr, with_words
    from psql_streamer_spark.operators.mlprep import (
        DECONTAM_EVAL_SOURCE,
        DECONTAM_K,
        _eval_bloom_positions,
        bloom_m_bits_for,
        build_bloom_words,
    )
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.decontam_stream import probe_contamination

    d = load_table(spark, "documents", sf_dir)
    t0 = time.time()
    bench_grams = (
        with_words(d.filter(F.col("source") == DECONTAM_EVAL_SOURCE))
        .select(F.explode(shingles_expr(F.col("__words"), k=DECONTAM_K)).alias("g"))
        .distinct()
        .persist()
    )
    n_battery = bench_grams.count()
    m_bits = bloom_m_bits_for(n_battery)
    words = build_bloom_words(_eval_bloom_positions(spark, sf_dir, m_bits), m_bits)
    battery_build_sec = time.time() - t0

    tag = f"decontam_{docs_per_file}x{files_per_trigger}"
    src = os.path.join(work, tag, "src")
    ckpt = os.path.join(work, tag, "ckpt")
    out = os.path.join(work, tag, "out")
    docs = d.filter(F.col("source") != DECONTAM_EVAL_SOURCE).select(
        "doc_id", "text"
    )
    n = docs.count()
    n_files = max(1, (n + docs_per_file - 1) // docs_per_file)
    docs.repartition(n_files).write.mode("overwrite").json(src)

    batch_times: list[float] = []
    batch_sizes: list[int] = []

    def _probe(batch_df, epoch_id):
        batch_df.persist()
        batch_sizes.append(batch_df.count())
        t0 = time.time()
        verdicts = probe_contamination(spark, batch_df, words, bench_grams, m_bits)
        verdicts.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            out
        )
        batch_times.append(time.time() - t0)
        batch_df.unpersist()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .json(src)
    )
    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    verd = (
        spark.read.parquet(out).agg(
            F.count("*").alias("docs"),
            F.count_if(F.col("contaminated")).alias("contaminated"),
            F.sum("n_bloom_hits").alias("bloom_hits"),
            F.sum("n_exact_hits").alias("exact_hits"),
        ).collect()[0]
        if batch_times
        else None
    )
    bench_grams.unpersist()
    lat_ms = sorted(t * 1000 for t in batch_times) or [0.0]
    sizes = sorted(batch_sizes) or [0]
    return {
        "events": n,
        "battery_grams": n_battery,
        "bloom_m_bits": m_bits,
        "battery_build_sec": round(battery_build_sec, 3),
        "events_per_batch_measured": {
            "min": sizes[0],
            "p50": int(statistics.median(sizes)),
            "max": sizes[-1],
        },
        "batches": len(batch_times),
        "docs_gated": int(verd.docs) if verd else 0,
        "contaminated_docs": int(verd.contaminated) if verd else 0,
        "bloom_hits": int(verd.bloom_hits) if verd else 0,
        "exact_hits": int(verd.exact_hits) if verd else 0,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n / wall, 1),
        "batch_latency_ms": {
            "p50": round(statistics.median(lat_ms), 1),
            "mean": round(statistics.fmean(lat_ms), 1),
            "max": round(lat_ms[-1], 1),
        },
    }


def _run_quality_config(
    spark, work: str, sf_dir: str, docs_per_file: int, files_per_trigger: int
) -> dict:
    """Ingest-time model-quality gating throughput (r13): every arriving
    document is featurized and scored under the frozen trained classifier
    (streaming/quality_stream.score_quality_batch). The model trains ONCE
    (model_build_sec — 16 fixed gradient rounds over the corpus,
    amortized like the near-dup index and the bloom battery); docs/sec is
    the events/sec of a pipeline that quality-scores every arriving
    document."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.text import _qm_train
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.quality_stream import (
        score_quality_batch,
    )

    t0 = time.time()
    w, _ = _qm_train(spark, sf_dir)
    model_build_sec = time.time() - t0

    tag = f"quality_{docs_per_file}x{files_per_trigger}"
    src = os.path.join(work, tag, "src")
    ckpt = os.path.join(work, tag, "ckpt")
    out = os.path.join(work, tag, "out")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n = docs.count()
    n_files = max(1, (n + docs_per_file - 1) // docs_per_file)
    docs.repartition(n_files).write.mode("overwrite").json(src)

    batch_times: list[float] = []
    batch_sizes: list[int] = []

    def _score(batch_df, epoch_id):
        batch_df.persist()
        batch_sizes.append(batch_df.count())
        t0 = time.time()
        verdicts = score_quality_batch(spark, batch_df, w)
        verdicts.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out)
        batch_times.append(time.time() - t0)
        batch_df.unpersist()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .json(src)
    )
    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    verd = (
        spark.read.parquet(out).agg(
            F.count("*").alias("docs"),
            F.count_if(F.col("predicted")).alias("passed"),
            F.count_if(~F.col("correct")).alias("disagreements"),
        ).collect()[0]
        if batch_times
        else None
    )
    lat_ms = sorted(t * 1000 for t in batch_times) or [0.0]
    sizes = sorted(batch_sizes) or [0]
    return {
        "events": n,
        "model_build_sec": round(model_build_sec, 3),
        "events_per_batch_measured": {
            "min": sizes[0],
            "p50": int(statistics.median(sizes)),
            "max": sizes[-1],
        },
        "batches": len(batch_times),
        "docs_scored": int(verd.docs) if verd else 0,
        "model_passed": int(verd.passed) if verd else 0,
        "rule_model_disagreements": int(verd.disagreements) if verd else 0,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n / wall, 1),
        "batch_latency_ms": {
            "p50": round(statistics.median(lat_ms), 1),
            "mean": round(statistics.fmean(lat_ms), 1),
            "max": round(lat_ms[-1], 1),
        },
    }


def _run_fused_config(
    spark,
    work: str,
    sf_dir: str,
    docs_per_file: int,
    files_per_trigger: int,
    with_langid: bool = False,
    with_drift: bool = False,
) -> dict:
    """Fused ingest-gate throughput (r14): every arriving document runs
    ALL THREE admission checks — near-dup probe + contamination gate +
    quality model — off ONE shared tokenize pass
    (streaming/fused_gate.fused_gate_verdicts). The amortized state
    (band index, bloom battery, bench grams, model weights) is built once
    and reported separately; docs/sec is the events/sec of a complete
    admission pipeline, to compare against the three standalone gates
    (whose sum-of-inverses is the unfused cost of the same work).

    ``with_langid=True`` (r15) adds the trained char-bigram NB as the
    FOURTH signal, tag-only (allowed_langs=None): the model trains once
    (counted into state_build_sec, materialized to a local relation so
    epochs never re-train), and every verdict additionally carries
    (predicted_lang, lang_admit) scored off the same tokenize pass.

    ``with_drift=True`` (r15) additionally attaches the corpus-drift
    MONITOR to the shared tokenize pass (one verdict row per epoch into
    its own dir); the delta vs the same config without it is the
    marginal cost of feed-drift observability inside the fused gate."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.functions.text_hash import (
        shingles_expr,
        with_words,
    )
    from psql_streamer_spark.operators.dedup import band_index_table
    from psql_streamer_spark.operators.mlprep import (
        DECONTAM_EVAL_SOURCE,
        DECONTAM_K,
        _eval_bloom_positions,
        build_bloom_words,
    )
    from psql_streamer_spark.operators.text import _qm_train
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.fused_gate import fused_gate_verdicts

    t0 = time.time()
    index_table = band_index_table(spark, sf_dir)
    corpus = load_table(spark, "documents", sf_dir)
    bloom_words = build_bloom_words(_eval_bloom_positions(spark, sf_dir))
    bench_grams = (
        with_words(corpus.filter(F.col("source") == DECONTAM_EVAL_SOURCE))
        .select(
            F.explode(shingles_expr(F.col("__words"), k=DECONTAM_K)).alias("g")
        )
        .distinct()
        .persist()
    )
    bench_grams.count()
    w, _ = _qm_train(spark, sf_dir)
    langid_model = None
    if with_langid:
        from psql_streamer_spark.operators.text import langid_nb_train

        m, p = langid_nb_train(with_words(corpus))
        # materialize the (bounded, see LANGID_BIGRAM_CAP) model to local
        # relations: each epoch broadcasts the trained table, never the
        # training plan
        langid_model = (
            spark.createDataFrame(m.collect(), m.schema),
            spark.createDataFrame(p.collect(), p.schema),
        )
    drift_ref = None
    if with_drift:
        from psql_streamer_spark.streaming.drift_stream import (
            build_reference_distribution,
        )

        drift_ref = build_reference_distribution(spark, sf_dir)
    state_build_sec = time.time() - t0

    tag = (
        f"fused{'4' if with_langid else ''}{'d' if with_drift else ''}"
        f"_{docs_per_file}x{files_per_trigger}"
    )
    src = os.path.join(work, tag, "src")
    ckpt = os.path.join(work, tag, "ckpt")
    out = os.path.join(work, tag, "out")
    docs = corpus.select("doc_id", "text")
    n = docs.count()
    n_files = max(1, (n + docs_per_file - 1) // docs_per_file)
    docs.repartition(n_files).write.mode("overwrite").json(src)

    batch_times: list[float] = []
    batch_sizes: list[int] = []

    def _gate(batch_df, epoch_id):
        batch_df.persist()
        batch_sizes.append(batch_df.count())
        t0 = time.time()
        tokenized = with_words(batch_df).persist()
        fused_gate_verdicts(
            spark,
            tokenized,
            index_table,
            corpus,
            bloom_words,
            bench_grams,
            w,
            langid_model=langid_model,
        ).write.mode("overwrite").parquet(
            os.path.join(out, f"epoch={epoch_id:012d}")
        )
        if drift_ref is not None:
            from psql_streamer_spark.streaming.drift_stream import (
                drift_batch,
            )

            drift_batch(tokenized, *drift_ref).write.mode(
                "overwrite"
            ).parquet(os.path.join(out + "_drift", f"epoch={epoch_id:012d}"))
        batch_times.append(time.time() - t0)
        tokenized.unpersist()
        batch_df.unpersist()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .json(src)
    )
    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    verd = (
        spark.read.parquet(out).agg(
            F.count("*").alias("docs"),
            F.count_if(F.col("admit")).alias("admitted"),
            F.count_if(F.col("contaminated")).alias("contaminated"),
            F.count_if(F.col("n_near_dup") > 0).alias("near_dup"),
            F.count_if(~F.col("predicted")).alias("model_rejects"),
        ).collect()[0]
        if batch_times
        else None
    )
    n_langs = (
        spark.read.parquet(out).select("predicted_lang").distinct().count()
        if with_langid and batch_times
        else None
    )
    bench_grams.unpersist()
    lat_ms = sorted(t * 1000 for t in batch_times) or [0.0]
    sizes = sorted(batch_sizes) or [0]
    return {
        "events": n,
        **({"langid_signal": True, "n_predicted_langs": n_langs} if with_langid else {}),
        **(
            {
                "drift_monitor": True,
                "n_drift_alerts": int(
                    spark.read.parquet(out + "_drift")
                    .agg(F.count_if(F.col("alert")).alias("a"))
                    .collect()[0]["a"]
                ),
            }
            if with_drift and batch_times
            else {}
        ),
        "state_build_sec": round(state_build_sec, 3),
        "events_per_batch_measured": {
            "min": sizes[0],
            "p50": int(statistics.median(sizes)),
            "max": sizes[-1],
        },
        "batches": len(batch_times),
        "docs_gated": int(verd.docs) if verd else 0,
        "admitted": int(verd.admitted) if verd else 0,
        "rejected_contaminated": int(verd.contaminated) if verd else 0,
        "rejected_near_dup": int(verd.near_dup) if verd else 0,
        "rejected_model": int(verd.model_rejects) if verd else 0,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n / wall, 1),
        "batch_latency_ms": {
            "p50": round(statistics.median(lat_ms), 1),
            "mean": round(statistics.fmean(lat_ms), 1),
            "max": round(lat_ms[-1], 1),
        },
    }


def _run_mm_neardup_config(
    spark, work: str, sf_dir: str, docs_per_file: int, files_per_trigger: int
) -> dict:
    """Ingest-time MEDIA near-dup alerting throughput (r14): every
    arriving payload is histogrammed, signed under the posting table's
    stored centering model, screened bucket-locally against only its
    touched buckets, and exact-cosine verified
    (streaming/mm_dedup_stream.probe_mm_bucket_index). The posting table
    is materialized once (index_build_sec, ingest-amortized)."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.multimodal import (
        mm_bucket_index_table,
    )
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.mm_dedup_stream import (
        probe_mm_bucket_index,
    )

    t0 = time.time()
    index_table = mm_bucket_index_table(spark, sf_dir)
    index_build_sec = time.time() - t0

    tag = f"mm_neardup_{docs_per_file}x{files_per_trigger}"
    src = os.path.join(work, tag, "src")
    ckpt = os.path.join(work, tag, "ckpt")
    out = os.path.join(work, tag, "out")
    docs = load_table(spark, "documents", sf_dir).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    n = docs.count()
    n_files = max(1, (n + docs_per_file - 1) // docs_per_file)
    docs.repartition(n_files).write.mode("overwrite").json(src)

    batch_times: list[float] = []
    batch_sizes: list[int] = []

    def _probe(batch_df, epoch_id):
        batch_df.persist()
        batch_sizes.append(batch_df.count())
        t0 = time.time()
        media = batch_df.select(
            "doc_id", F.encode("text", "utf-8").alias("payload")
        )
        probe_mm_bucket_index(spark, media, index_table).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"epoch={epoch_id:012d}"))
        batch_times.append(time.time() - t0)
        batch_df.unpersist()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .json(src)
    )
    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    n_alerts = spark.read.parquet(out).count() if batch_times else 0
    lat_ms = sorted(t * 1000 for t in batch_times) or [0.0]
    sizes = sorted(batch_sizes) or [0]
    return {
        "events": n,
        "index_build_sec": round(index_build_sec, 3),
        "events_per_batch_measured": {
            "min": sizes[0],
            "p50": int(statistics.median(sizes)),
            "max": sizes[-1],
        },
        "batches": len(batch_times),
        "alerts": n_alerts,
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
    from psql_streamer_spark.streaming.sinks import ParquetSink
    from psql_streamer_spark.warmup import warm_expression_paths

    env_before = _env_snapshot()
    cpus = os.cpu_count() or 1
    # same calibrated threshold as bench.py (r11): loadavg >= 4 at start
    # means deltas beyond the noise band are plausibly load
    contended = env_before.get("loadavg_1m", 0.0) >= 4.0

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
            # flat ParquetSink CONTROL (r12 advice): same sink class and
            # delivery semantics (append, at-least-once) as the lake
            # config below, no partition_cols — the lake toll is
            # bulk_drain_flat vs bulk_drain_lake, isolating partitioning.
            # (bulk_drain_1m uses EpochParquetSink — per-epoch overwrite
            # dirs, effectively-once — a different sink class; comparing
            # lake against IT confounded sink class with layout.)
            "bulk_drain_flat": _run_config(
                spark, work, "bulk_drain_flat", 1_000_000, 15_625, 8,
                sink_factory=lambda out: ParquetSink(out),
            ),
            # same drain, landing the r11 per-table LAKE layout
            # (ParquetSink partition_cols=["table"]): measures what the
            # partitioned ingest path costs vs the flat ParquetSink
            # control above — each epoch writes one file set per table
            # directory, so the delta is file-creation overhead, the
            # small-files toll that compact_parquet's per-leaf
            # compaction exists to pay down
            "bulk_drain_lake": _run_config(
                spark, work, "bulk_drain_lake", 1_000_000, 15_625, 8,
                sink_factory=lambda out: ParquetSink(
                    out, partition_cols=["table"]
                ),
            ),
            # ingest-time near-dup alerting: every arriving doc signed,
            # banded, probed against the materialized corpus band index,
            # exact-Jaccard verified (r6 verdict task #6). Two batch
            # granularities — the 500-doc point shows the ~1.4 s epoch
            # floor of the probe+verify+write cycle, the bulk point its
            # amortized throughput (same epoch-sizing conclusion as the
            # CDC path above)
            "neardup_probe_500": _run_neardup_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 500, 1
            ),
            "neardup_probe_bulk": _run_neardup_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 2_500, 2
            ),
            # ingest-time contamination gating (r12): every arriving doc's
            # grams probe the broadcast battery bitmap; bloom hits feed the
            # exact verify join. Same two granularities as the near-dup
            # probe: the 500-doc point exposes the per-epoch floor, the
            # bulk point the amortized gate throughput
            "decontam_gate_500": _run_decontam_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 500, 1
            ),
            "decontam_gate_bulk": _run_decontam_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 2_500, 2
            ),
            # ingest-time model quality gating (r13): every arriving doc
            # featurized + scored under the frozen trained classifier.
            # Same two granularities as the other gates
            "quality_gate_500": _run_quality_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 500, 1
            ),
            "quality_gate_bulk": _run_quality_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 2_500, 2
            ),
            # fused admission gate (r14): all three checks off one
            # tokenize pass — the number a real ingest pays per doc. The
            # bulk point should land near the most expensive standalone
            # gate (shared scan), far above the sum-of-inverses floor of
            # running the three gates as separate streams
            "fused_gate_500": _run_fused_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 500, 1
            ),
            "fused_gate_bulk": _run_fused_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 2_500, 2
            ),
            # 4-signal gate (r15): + trained langid off the same tokenize
            # pass, tag-only. The delta vs fused_gate_bulk is the marginal
            # cost of language classification inside the fused admission
            "fused_gate4_bulk": _run_fused_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 2_500, 2, with_langid=True
            ),
            # 4-signal gate + drift monitor (r15): the feed-drift
            # observer off the same tokenize pass. Delta vs
            # fused_gate4_bulk = the monitor's marginal cost
            "fused_gate4d_bulk": _run_fused_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 2_500, 2, with_langid=True, with_drift=True
            ),
            # ingest-time MEDIA near-dup probe (r14): payloads signed
            # under the posting table's stored model, bucket-local screen
            "mm_neardup_bulk": _run_mm_neardup_config(
                spark, work, os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ), 2_500, 2
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
