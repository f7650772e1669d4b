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
