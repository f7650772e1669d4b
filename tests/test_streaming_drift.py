"""Streaming drift monitor: planted shifted-feed alert, per-epoch parity
with the batch twin, and a hand-computed numeric pin for the statistic.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_drift_statistic_matches_hand_computation(spark):
    """Tiny fixed reference + one batch, drift verified against the same
    left-to-right fold computed independently in Python (identical IEEE
    op order -> identical double)."""
    from psql_streamer_spark.streaming.drift_stream import drift_batch

    ref_tokens, ref_counts, ref_total = ["a", "b"], [3, 1], 5  # oov mass 1
    d = spark.createDataFrame(
        [(1, "a a b c")], "doc_id long, text string"
    )
    row = drift_batch(d, ref_tokens, ref_counts, ref_total).collect()[0]
    assert (row.n_docs, row.n_tokens, row.oov_tokens) == (1, 4, 1)
    p = [3 / 5, 1 / 5, 1 / 5]
    q = [2 / 4, 1 / 4, 1 / 4]
    expect = None
    for pi, qi in zip(p, q):
        term = (pi - qi) * (pi - qi) / (pi + qi) if (pi + qi) > 0 else 0.0
        expect = term if expect is None else expect + term
    assert row.drift == expect
    assert row.alert is False


def test_drift_empty_batch_reports_null_not_nan(spark):
    from psql_streamer_spark.streaming.drift_stream import drift_batch

    d = spark.createDataFrame([], "doc_id long, text string")
    row = drift_batch(d, ["a"], [1], 1).collect()[0]
    assert (row.n_docs, row.n_tokens, row.drift, row.alert) == (
        0,
        0,
        None,
        False,
    )


def test_streaming_drift_monitor_flags_shifted_feed(spark, tmp_path):
    """Reference built from the sf0.001 corpus; epoch A re-feeds corpus
    documents (in-distribution — no alert), epoch B feeds a disjoint
    synthetic vocabulary (the broken-extractor / new-site-family case —
    alert). Each streamed verdict must equal the batch twin on the same
    documents, and the shifted epoch must trip the threshold."""
    from psql_streamer_spark.operators.mlprep import md5_bucket
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.drift_stream import (
        DRIFT_ALERT_THRESHOLD,
        build_reference_distribution,
        drift_batch,
        start_drift_stream,
    )

    ref = build_reference_distribution(spark, SF_SMALL)
    assert len(ref[0]) > 0 and ref[2] > 0

    corpus_rows = (
        load_table(spark, "documents", SF_SMALL)
        .filter(md5_bucket(F.col("doc_id"), 8) == 3)
        .select("doc_id", "text")
        .collect()  # test fixture setup, not an operator path
    )
    assert corpus_rows
    shifted_rows = [
        (10_000 + i, " ".join(f"zzzq{i}w{j}" for j in range(30)))
        for i in range(20)
    ]

    src = tmp_path / "incoming_drift"
    src.mkdir()
    (src / "a_epoch.json").write_text(
        "\n".join(
            json.dumps({"doc_id": r.doc_id, "text": r.text})
            for r in corpus_rows
        )
        + "\n"
    )
    (src / "b_epoch.json").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t}) for i, t in shifted_rows
        )
        + "\n"
    )

    q = start_drift_stream(
        spark,
        str(src),
        ref,
        str(tmp_path / "verdicts"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "verdicts")).collect()
    assert len(got) == 2
    by_docs = {r.n_docs: r for r in got}
    in_dist = by_docs[len(corpus_rows)]
    shifted = by_docs[len(shifted_rows)]
    assert in_dist.alert is False
    assert in_dist.drift < DRIFT_ALERT_THRESHOLD
    assert shifted.alert is True
    assert shifted.drift > 1.5  # disjoint vocab: near the max of 2
    assert shifted.oov_tokens == shifted.n_tokens  # all mass OOV

    # per-epoch parity with the batch twin on the same documents
    batch_in = drift_batch(
        spark.createDataFrame(
            [(r.doc_id, r.text) for r in corpus_rows],
            "doc_id long, text string",
        ),
        *ref,
    ).collect()[0]
    assert (in_dist.n_tokens, in_dist.oov_tokens, in_dist.drift) == (
        batch_in.n_tokens,
        batch_in.oov_tokens,
        batch_in.drift,
    )
    batch_sh = drift_batch(
        spark.createDataFrame(shifted_rows, "doc_id long, text string"),
        *ref,
    ).collect()[0]
    assert (shifted.n_tokens, shifted.oov_tokens, shifted.drift) == (
        batch_sh.n_tokens,
        batch_sh.oov_tokens,
        batch_sh.drift,
    )


def test_fused_gate_stream_emits_drift_off_shared_tokenize(spark, tmp_path):
    """The fused gate with ``drift_ref`` attached writes one drift verdict
    per epoch into its own sink, each equal to the batch twin on that
    epoch's documents — and the admission verdicts keep their exact
    3-signal schema (drift observes, never gates)."""
    from psql_streamer_spark.operators.dedup import band_index_table
    from psql_streamer_spark.operators.mlprep import (
        DECONTAM_EVAL_SOURCE,
        DECONTAM_K,
        _eval_bloom_positions,
        build_bloom_words,
        md5_bucket,
    )
    from psql_streamer_spark.operators.text import _qm_train
    from psql_streamer_spark.functions.text_hash import (
        shingles_expr,
        with_words,
    )
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.drift_stream import (
        build_reference_distribution,
        drift_batch,
    )
    from psql_streamer_spark.streaming.fused_gate import (
        start_fused_gate_stream,
    )

    d = load_table(spark, "documents", SF_SMALL)
    batch = (
        d.filter(md5_bucket(F.col("doc_id"), 4) == 2)
        .select("doc_id", "text")
        .collect()  # test fixture setup, not an operator path
    )
    assert batch
    table = band_index_table(spark, SF_SMALL)
    bloom_words = build_bloom_words(_eval_bloom_positions(spark, SF_SMALL))
    bench_grams = (
        with_words(d.filter(F.col("source") == DECONTAM_EVAL_SOURCE))
        .select(
            F.explode(shingles_expr(F.col("__words"), k=DECONTAM_K)).alias(
                "g"
            )
        )
        .distinct()
    )
    w, _ = _qm_train(spark, SF_SMALL)
    ref = build_reference_distribution(spark, SF_SMALL)

    src = tmp_path / "incoming_fused_drift"
    src.mkdir()
    half = max(1, len(batch) // 2)
    chunks = [c for c in (batch[:half], batch[half:]) if c]
    for i, chunk in enumerate(chunks):
        (src / f"batch{i}.json").write_text(
            "\n".join(
                json.dumps({"doc_id": r.doc_id, "text": r.text})
                for r in chunk
            )
            + "\n"
        )

    verdict_sink = str(tmp_path / "fused_verdicts")
    drift_sink = str(tmp_path / "drift_verdicts")
    q = start_fused_gate_stream(
        spark,
        str(src),
        table,
        d,
        bloom_words,
        bench_grams,
        w,
        verdict_sink,
        str(tmp_path / "ckpt_fused_drift"),
        drift_ref=ref,
        drift_sink_dir=drift_sink,
    )
    assert q.awaitTermination(240), "fused+drift stream did not drain"

    verdicts = spark.read.parquet(verdict_sink)
    assert "drift" not in verdicts.columns  # observer, not a signal
    assert sorted(r.doc_id for r in verdicts.collect()) == sorted(
        r.doc_id for r in batch
    )

    got = sorted(
        (r.n_docs, r.n_tokens, r.oov_tokens, r.drift, r.alert)
        for r in spark.read.parquet(drift_sink).collect()
    )
    want = sorted(
        (w.n_docs, w.n_tokens, w.oov_tokens, w.drift, w.alert)
        for chunk in chunks
        for w in drift_batch(
            spark.createDataFrame(
                [(r.doc_id, r.text) for r in chunk],
                "doc_id long, text string",
            ),
            *ref,
        ).collect()
    )
    assert len(got) == len(chunks)
    assert got == want


def test_closed_loop_emits_drift_per_epoch(spark, tmp_path):
    """start_fused_ingest_loop with ``drift_ref``: one drift verdict per
    epoch, computed on the ARRIVALS (pre-admission — the monitor watches
    the feed, not the survivors), with the shifted epoch flagged; loop
    admission state machinery runs unchanged alongside."""
    from psql_streamer_spark.functions.text_hash import (
        shingles_expr,
        with_words,
    )
    from psql_streamer_spark.operators.dedup import (
        BAND_INDEX_BUCKETS,
        band_index_table,
    )
    from psql_streamer_spark.operators.mlprep import (
        DECONTAM_EVAL_SOURCE,
        DECONTAM_K,
        _eval_bloom_positions,
        build_bloom_words,
    )
    from psql_streamer_spark.operators.text import _qm_train
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.drift_stream import (
        build_reference_distribution,
        drift_batch,
    )
    from psql_streamer_spark.streaming.fused_gate import (
        start_fused_ingest_loop,
    )

    d = load_table(spark, "documents", SF_SMALL)
    base = band_index_table(spark, SF_SMALL)
    loop_tbl = "fused_loop_index_drift_test"
    spark.sql(f"DROP TABLE IF EXISTS {loop_tbl}")
    (
        spark.table(base)
        .write.bucketBy(BAND_INDEX_BUCKETS, "bkey")
        .sortBy("bkey")
        .mode("overwrite")
        .saveAsTable(loop_tbl)
    )
    bloom_words = build_bloom_words(_eval_bloom_positions(spark, SF_SMALL))
    bench_grams = (
        with_words(d.filter(F.col("source") == DECONTAM_EVAL_SOURCE))
        .select(
            F.explode(shingles_expr(F.col("__words"), k=DECONTAM_K)).alias(
                "g"
            )
        )
        .distinct()
    )
    w, _ = _qm_train(spark, SF_SMALL)
    ref = build_reference_distribution(spark, SF_SMALL)

    in_dist = [
        (9100 + i, r.text)
        for i, r in enumerate(d.select("text").limit(8).collect())
    ]
    shifted = [
        (9200 + i, " ".join(f"xxdrift{i}y{j}" for j in range(25)))
        for i in range(8)
    ]
    src = tmp_path / "loop_drift_src"
    src.mkdir()
    (src / "e0.json").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t}) for i, t in in_dist
        )
        + "\n"
    )
    (src / "e1.json").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t}) for i, t in shifted
        )
        + "\n"
    )
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(src / "e0.json", (now - 120, now - 120))
    _os.utime(src / "e1.json", (now - 60, now - 60))

    drift_dir = str(tmp_path / "loop_drift")
    try:
        q = start_fused_ingest_loop(
            spark,
            str(src),
            loop_tbl,
            d,
            bloom_words,
            bench_grams,
            w,
            str(tmp_path / "loop_verdicts"),
            str(tmp_path / "loop_admitted"),
            str(tmp_path / "ckpt_loop_drift"),
            drift_ref=ref,
            drift_sink_dir=drift_dir,
        )
        assert q.awaitTermination(240), "loop did not drain"

        rows = spark.read.parquet(drift_dir).collect()
        assert len(rows) == 2
        alerts = sorted(r.alert for r in rows)
        assert alerts == [False, True]  # exactly the shifted epoch
        # parity with the batch twin on each epoch's arrivals
        got = sorted((r.n_tokens, r.oov_tokens, r.drift) for r in rows)
        want = sorted(
            (b.n_tokens, b.oov_tokens, b.drift)
            for docs in (in_dist, shifted)
            for b in drift_batch(
                spark.createDataFrame(docs, "doc_id long, text string"),
                *ref,
            ).collect()
        )
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {loop_tbl}")


def test_drift_empty_reference_fails_fast(spark):
    from psql_streamer_spark.streaming.drift_stream import drift_batch

    d = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="reference is empty"):
        drift_batch(d, [], [], 0)


def test_half_wired_drift_pair_raises_at_wiring(spark, tmp_path):
    """Regression: passing only one of drift_ref/drift_sink_dir must
    raise at stream wiring — a silent no-op would leave the operator
    believing the canary is live."""
    from psql_streamer_spark.streaming.fused_gate import _drift_sink

    ref = (["a"], [1], 1)
    assert _drift_sink(None, None) is None
    assert _drift_sink(ref, str(tmp_path / "d")) is not None
    with pytest.raises(ValueError, match="BOTH drift_ref and drift_sink_dir"):
        _drift_sink(ref, None)
    with pytest.raises(ValueError, match="BOTH drift_ref and drift_sink_dir"):
        _drift_sink(None, str(tmp_path / "d"))


def test_drift_null_text_docs_counted_not_silently_excluded(spark):
    """r16 (r15 advice #4): a NULL-text doc (malformed JSON under the
    stream's permissive schema) must appear in n_docs AND n_null_docs
    and contribute zero tokens — not NULL-poison or silently vanish
    from the epoch's statistic."""
    from psql_streamer_spark.streaming.drift_stream import drift_batch

    ref = (["a", "b"], [3, 1], 5)
    d = spark.createDataFrame(
        [(1, "a a b c"), (2, None)], "doc_id long, text string"
    )
    row = drift_batch(d, *ref).collect()[0]
    assert (row.n_docs, row.n_null_docs, row.n_tokens) == (2, 1, 4)
    # statistic identical to the clean single-doc batch: the NULL doc
    # adds no token mass
    clean = drift_batch(
        spark.createDataFrame([(1, "a a b c")], "doc_id long, text string"),
        *ref,
    ).collect()[0]
    assert row.drift == clean.drift and row.oov_tokens == clean.oov_tokens
