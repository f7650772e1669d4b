"""Export-shard manifest: the hand-off contract between the pipeline and
the trainer. The registered query computes the manifest from the source
corpus; these tests pin the property that makes it a CONTRACT — the same
manifest must be re-derivable from the physically written shards, so a
trainer (or auditor) can verify a delivery without trusting the writer."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from psql_streamer_spark.operators.mlprep import (
    EXPORT_SHARDS,
    export_manifest_columns,
    md5_bucket,
    mlprep_export_shards,
)
from psql_streamer_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_written_shards_reproduce_the_manifest(spark, tmp_path):
    out = str(tmp_path / "export")
    d = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    d.withColumn(
        "shard_id", md5_bucket(F.col("doc_id"), EXPORT_SHARDS)
    ).write.partitionBy("shard_id").parquet(out)

    # every shard leaf exists as its own dir (the trainer's read unit)
    leaves = sorted(n for n in os.listdir(out) if n.startswith("shard_id="))
    assert leaves, "no shard leaves written"

    rederived = {
        r.shard_id: (r.n_docs, r.n_tokens, r.content_hash)
        for r in spark.read.parquet(out)
        .groupBy("shard_id")
        .agg(*export_manifest_columns())
        .collect()
    }
    manifest = {
        r.shard_id: (r.n_docs, r.n_tokens, r.content_hash)
        for r in mlprep_export_shards(spark, SF_DIR).collect()
    }
    assert rederived == manifest
    # the manifest covers the whole corpus exactly once
    assert sum(v[0] for v in manifest.values()) == d.count()


def test_content_hash_detects_any_document_change(spark):
    """Flipping one document's text must change exactly that shard's
    content_hash and nothing else; dropping a document likewise. (The
    XOR construction makes both detectable; this pins it.)"""
    d = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    victim = d.orderBy("doc_id").first()
    victim_shard_row = (
        d.filter(F.col("doc_id") == victim.doc_id)
        .select(md5_bucket(F.col("doc_id"), EXPORT_SHARDS).alias("s"))
        .first()
    )
    victim_shard = victim_shard_row.s

    def manifest_of(df):
        return {
            r.shard_id: (r.n_docs, r.n_tokens, r.content_hash)
            for r in df.groupBy(
                md5_bucket(F.col("doc_id"), EXPORT_SHARDS).alias("shard_id")
            )
            .agg(*export_manifest_columns())
            .collect()
        }

    base = manifest_of(d)
    mutated = manifest_of(
        d.withColumn(
            "text",
            F.when(
                F.col("doc_id") == victim.doc_id,
                F.concat(F.col("text"), F.lit(" tampered")),
            ).otherwise(F.col("text")),
        )
    )
    dropped = manifest_of(d.filter(F.col("doc_id") != victim.doc_id))

    for shard, vals in base.items():
        if shard == victim_shard:
            assert mutated[shard][2] != vals[2]  # hash moved
            assert mutated[shard][0] == vals[0]  # same doc count
            assert dropped[shard][0] == vals[0] - 1
            assert dropped[shard][2] != vals[2]
        else:
            assert mutated[shard] == vals
            assert dropped[shard] == vals


def test_manifest_plan_is_single_pass_partial_agg(spark):
    plan = (
        mlprep_export_shards(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one corpus scan, map-side partial aggregation, no join anywhere
    assert "partial_" in plan
    assert "Join" not in plan


def test_corpus_prep_report_partitions_every_doc_once(spark):
    """Stage attrition must be a PARTITION of the corpus (every doc in
    exactly one stage), and the dropped_duplicate stage must fire where
    exact duplicates exist (sf0.1 is the smallest corpus that has them)
    with exactly the non-canonical quality-surviving copies."""
    from psql_streamer_spark.operators.mlprep import (
        PREP_MIN_WORDS,
        pipeline_corpus_prep_report,
    )

    sf = "/root/testdata/sf0.1"
    rows = {r.stage: r for r in pipeline_corpus_prep_report(spark, sf).collect()}
    d = load_table(spark, "documents", sf)
    assert sum(r.n_docs for r in rows.values()) == d.count()
    assert set(rows) <= {
        "dropped_quality", "dropped_duplicate", "train", "val", "test"
    }
    assert "dropped_duplicate" in rows, "sf0.1 plants exact duplicates"

    # expected duplicates: quality survivors whose fingerprint has a
    # smaller surviving doc_id (independent recomputation)
    from pyspark.sql import Window

    from psql_streamer_spark.functions.text_hash import with_words

    scored = with_words(d).select(
        "doc_id",
        F.size("__words").alias("n_words"),
        F.md5(F.concat_ws(" ", F.lower(F.col("text")))).alias("fp"),
    )
    surv = scored.filter(F.col("n_words") >= PREP_MIN_WORDS)
    canon = F.min("doc_id").over(Window.partitionBy("fp"))
    expected_dups = surv.withColumn("c", canon).filter(
        F.col("doc_id") != F.col("c")
    ).count()
    assert rows["dropped_duplicate"].n_docs == expected_dups > 0


def test_corpus_prep_report_full_partitions_every_doc_once(spark):
    """The FULL composed report (trained model gate -> quarantine ->
    dedup -> sampling -> split) must also be a partition of the corpus,
    its stage set must be exactly the documented terminals, and each
    stage's count must equal an independent recomputation from the
    registered operators it composes."""
    from psql_streamer_spark.operators.mlprep import (
        DECONTAM_EVAL_SOURCE,
        decontaminate_bloom_ngrams,
        pipeline_corpus_prep_report_full,
    )
    from psql_streamer_spark.operators.text import (
        mlprep_sample_by_quality,
        text_quality_model_scores,
    )

    sf = "/root/testdata/sf0.1"
    rows = {
        r.stage: r
        for r in pipeline_corpus_prep_report_full(spark, sf).collect()
    }
    d = load_table(spark, "documents", sf)
    assert sum(r.n_docs for r in rows.values()) == d.count()
    assert set(rows) <= {
        "eval_battery",
        "rejected_model",
        "quarantined_contaminated",
        "dropped_duplicate",
        "dropped_sampling",
        "train",
        "val",
        "test",
    }
    # independent recomputation of the first three stages from the
    # registered ops the report claims to reuse
    n_eval = d.filter(F.col("source") == DECONTAM_EVAL_SOURCE).count()
    assert rows["eval_battery"].n_docs == n_eval
    model = {
        r.doc_id: r.predicted
        for r in text_quality_model_scores(spark, sf).collect()
    }
    eval_ids = {
        r.doc_id
        for r in d.filter(
            F.col("source") == DECONTAM_EVAL_SOURCE
        ).select("doc_id").collect()
    }
    n_rejected = sum(
        1 for k, p in model.items() if k not in eval_ids and not p
    )
    assert rows["rejected_model"].n_docs == n_rejected
    contam_ids = {
        r.doc_id
        for r in decontaminate_bloom_ngrams(spark, sf)
        .filter(F.col("n_exact_hits") > 0)
        .collect()
    }
    n_quarantined = sum(
        1 for k in contam_ids if model.get(k) and k not in eval_ids
    )
    got_q = rows.get("quarantined_contaminated")
    assert (got_q.n_docs if got_q else 0) == n_quarantined
    # remaining stages recomputed driver-side from the composed ops:
    # dedup canonical survivor among gate survivors, then
    # mlprep_sample_by_quality's exact coin, then the md5 split buckets
    import hashlib

    from psql_streamer_spark.functions.text_hash import with_words

    sampled = {
        r.doc_id: r.sampled
        for r in mlprep_sample_by_quality(spark, sf).collect()
    }
    fps = {
        r.doc_id: r.fp
        for r in with_words(d)
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.lower(F.col("text")))).alias("fp"),
        )
        .collect()
    }
    gate = {
        k
        for k, p in model.items()
        if p and k not in eval_ids and k not in contam_ids
    }
    canon: dict = {}
    for k in sorted(gate):
        canon.setdefault(fps[k], k)
    dups = {k for k in gate if canon[fps[k]] != k}
    after_dedup = gate - dups
    dropped_sampling = {k for k in after_dedup if not sampled[k]}
    kept = after_dedup - dropped_sampling

    def bucket(doc_id: int, n: int = 100) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        return int(h, 16) % n

    want = {
        "dropped_duplicate": len(dups),
        "dropped_sampling": len(dropped_sampling),
        "train": sum(1 for k in kept if bucket(k) < 80),
        "val": sum(1 for k in kept if 80 <= bucket(k) < 90),
        "test": sum(1 for k in kept if bucket(k) >= 90),
    }
    for stage_name, n in want.items():
        got = rows.get(stage_name)
        assert (got.n_docs if got else 0) == n, (stage_name, n, got)
    assert want["dropped_duplicate"] > 0, "sf0.1 plants exact duplicates"


def test_mm_dedup_binary_flags_planted_duplicates(spark):
    """sf0.1 plants 8 exact-duplicate documents; the binary content-hash
    dedup must flag exactly the non-canonical copies and nothing at the
    smaller SFs (which plant none)."""
    from psql_streamer_spark.operators.multimodal import mm_dedup_binary

    small = mm_dedup_binary(spark, SF_DIR)
    assert small.filter(F.col("is_duplicate")).count() == 0

    big = mm_dedup_binary(spark, "/root/testdata/sf0.1")
    dups = big.filter(F.col("is_duplicate"))
    assert dups.count() == 8
    # every duplicate's canonical doc shares its content hash and is older
    joined = dups.alias("d").join(
        big.alias("c"),
        (F.col("d.canonical_doc_id") == F.col("c.doc_id")),
    )
    bad = joined.filter(
        (F.col("d.content_md5") != F.col("c.content_md5"))
        | (F.col("c.doc_id") >= F.col("d.doc_id"))
        | F.col("c.is_duplicate")
    ).count()
    assert bad == 0
