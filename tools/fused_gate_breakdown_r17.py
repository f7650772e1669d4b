"""Per-epoch stage breakdown of the fused admission gate (r17, VERDICT #4).

The r16 verdict asked whether the fused 4-signal gate's ~1.0k docs/s hides
reducible overhead: do the four signals really share the one `__words`
tokenize, do the persisted frames release per epoch, and where does one
epoch's wall time actually go?  bench_stream answers at the pipeline level
(fused rate vs standalone-gate rates); this tool answers at the STAGE
level: it builds the exact amortized state `_run_fused_config` builds,
takes one bulk micro-batch (the whole sf0.1 documents table, 5000 docs —
the `fused_gate_bulk` shape), and times each verdict signal INDIVIDUALLY
off the same persisted tokenize, via the noop sink (guide §1.4), warm
best-of-N after a cold pass.

Reported rows:

- tokenize:    with_words(batch).persist + materialize (the shared pass)
- quality:     score_quality_batch over the persisted frame
- decontam:    probe_contamination over the persisted frame
- neardup:     probe_band_index + per-doc agg over the persisted frame
- langid:      langid_nb_score over the persisted frame
- drift:       drift_batch over the persisted frame (the 4d marginal)
- fused3/fused4: full fused_gate_verdicts (3- and 4-signal assembly)

If fused4 is close to tokenize + the four signal rows, the epoch cost IS
the models and there is nothing left to fuse away; a large gap would mean
assembly overhead (joins, re-tokenize, unreleased frames) worth chasing.

Usage: python tools/fused_gate_breakdown_r17.py [sf_dir] [reps]
Writes ONE JSON line; also honors SPARK_GRAFT_STREAM_OUT-style env var
FUSED_BREAKDOWN_OUT for a file copy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(spark, label: str, make, reps: int) -> dict:
    """Cold + warm best-of-reps wall time of a frame factory via noop."""
    spark.sparkContext.setJobDescription(f"fused-breakdown: {label}")
    t0 = time.time()
    _noop(make())
    cold = time.time() - t0
    warm = []
    for _ in range(reps):
        t0 = time.time()
        _noop(make())
        warm.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return {"cold": round(cold, 3), "warm": warm, "best_warm": min(warm)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from psql_streamer_spark.functions.text_hash import shingles_expr, with_words
    from psql_streamer_spark.operators.dedup import band_index_table
    from psql_streamer_spark.operators.mlprep import (
        DECONTAM_EVAL_SOURCE,
        DECONTAM_K,
        _eval_bloom_positions,
        build_bloom_words,
    )
    from psql_streamer_spark.operators.text import (
        _qm_train,
        langid_nb_score,
        langid_nb_train,
    )
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.sources.tables import load_table
    from psql_streamer_spark.streaming.fused_gate import fused_gate_verdicts
    from psql_streamer_spark.streaming.drift_stream import (
        build_reference_distribution,
        drift_batch,
    )
    from psql_streamer_spark.streaming.decontam_stream import (
        probe_contamination,
    )
    from psql_streamer_spark.streaming.dedup_stream import probe_band_index
    from psql_streamer_spark.streaming.quality_stream import (
        score_quality_batch,
    )

    spark = get_spark("fused_gate_breakdown_r17")
    loadavg0 = os.getloadavg()[0]

    # amortized state — identical to bench_stream._run_fused_config
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
    m, p = langid_nb_train(with_words(corpus))
    langid_model = (
        spark.createDataFrame(m.collect(), m.schema),
        spark.createDataFrame(p.collect(), p.schema),
    )
    drift_ref = build_reference_distribution(spark, sf_dir)
    state_build_sec = round(time.time() - t0, 3)

    # one bulk micro-batch: the fused_gate_bulk shape (all docs, one epoch)
    batch = corpus.select("doc_id", "text").persist()
    n_docs = batch.count()

    out: dict = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "reps": reps,
        "state_build_sec": state_build_sec,
        "loadavg_start": round(loadavg0, 2),
        "stages": {},
    }

    # the shared tokenize pass, measured alone (not persisted for this row
    # so the timing includes the real per-epoch tokenize work)
    out["stages"]["tokenize"] = _time(
        spark, "tokenize", lambda: with_words(batch), reps
    )

    # signals off ONE persisted tokenize, exactly like an epoch
    tokenized = with_words(batch).persist()
    tokenized.count()

    out["stages"]["quality"] = _time(
        spark, "quality", lambda: score_quality_batch(spark, tokenized, w), reps
    )
    out["stages"]["decontam"] = _time(
        spark,
        "decontam",
        lambda: probe_contamination(
            spark, tokenized, bloom_words, bench_grams
        ),
        reps,
    )
    out["stages"]["neardup"] = _time(
        spark,
        "neardup",
        lambda: probe_band_index(spark, tokenized, index_table, corpus, 0.8)
        .groupBy("new_doc_id")
        .agg(F.count("*").alias("n"), F.max("jaccard").alias("j")),
        reps,
    )
    out["stages"]["langid"] = _time(
        spark,
        "langid",
        lambda: langid_nb_score(tokenized, *langid_model).select(
            "doc_id", "predicted_lang"
        ),
        reps,
    )
    out["stages"]["drift"] = _time(
        spark, "drift", lambda: drift_batch(tokenized, *drift_ref), reps
    )

    # full assemblies (tokenize inside, like a real epoch on a fresh batch)
    out["stages"]["fused3_full"] = _time(
        spark,
        "fused3 full epoch",
        lambda: fused_gate_verdicts(
            spark,
            with_words(batch),
            index_table,
            corpus,
            bloom_words,
            bench_grams,
            w,
        ),
        reps,
    )
    out["stages"]["fused4_full"] = _time(
        spark,
        "fused4 full epoch",
        lambda: fused_gate_verdicts(
            spark,
            with_words(batch),
            index_table,
            corpus,
            bloom_words,
            bench_grams,
            w,
            langid_model=langid_model,
        ),
        reps,
    )
    # assembly over the ALREADY-persisted tokenize: the delta vs
    # fused4_full is what the shared persisted pass saves per epoch
    out["stages"]["fused4_pretokenized"] = _time(
        spark,
        "fused4 pre-tokenized",
        lambda: fused_gate_verdicts(
            spark,
            tokenized,
            index_table,
            corpus,
            bloom_words,
            bench_grams,
            w,
            langid_model=langid_model,
        ),
        reps,
    )

    tokenized.unpersist()
    batch.unpersist()
    bench_grams.unpersist()

    sig_sum = sum(
        out["stages"][s]["best_warm"]
        for s in ("quality", "decontam", "neardup", "langid")
    )
    out["signal_sum_best_warm"] = round(sig_sum, 3)
    out["fused4_best_warm"] = out["stages"]["fused4_full"]["best_warm"]
    out["assembly_overhead_sec"] = round(
        out["fused4_best_warm"]
        - out["stages"]["tokenize"]["best_warm"]
        - sig_sum,
        3,
    )
    out["loadavg_end"] = round(os.getloadavg()[0], 2)

    line = json.dumps(out)
    print(line)
    dst = os.environ.get("FUSED_BREAKDOWN_OUT")
    if dst:
        with open(dst, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
