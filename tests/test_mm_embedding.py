"""Perceptual payload near-dup (mm_dedup_embedding): exact-duplicate
guarantee, precision/recall vs brute-force truth, and the bucket-local
mining plan guard."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from psql_streamer_spark.operators.multimodal import (
    MM_COSINE_DUP,
    MM_HIST_DIM,
    mm_dedup_binary,
    mm_dedup_embedding,
)
from tests.conftest import SF_SMALL


def _truth_pairs(spark):
    """Brute-force ground truth from the raw texts."""
    from psql_streamer_spark.sources.tables import load_table

    rows = load_table(spark, "documents", SF_SMALL).select("doc_id", "text").collect()
    ids, vecs = [], []
    for r in rows:
        b = np.frombuffer(r.text.encode(), dtype=np.uint8).astype(np.int64)
        if len(b) < 2:
            continue
        idx = (b[:-1] * 31 + b[1:]) % MM_HIST_DIM
        h = np.bincount(idx, minlength=MM_HIST_DIM).astype(np.float64)
        ids.append(r.doc_id)
        vecs.append(h / np.linalg.norm(h))
    m = np.stack(vecs)
    cos = m @ m.T
    ai, bi = np.nonzero(np.triu(cos >= MM_COSINE_DUP, k=1))
    ids = np.array(ids)
    return {
        (min(a, b), max(a, b)): cos[i, j]
        for i, j, a, b in zip(ai, bi, ids[ai], ids[bi])
    }


def test_mm_embedding_precision_exact_and_recall_floor(spark):
    truth = _truth_pairs(spark)
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in mm_dedup_embedding(spark, SF_SMALL).collect()
    }
    # precision is exact by construction (rescore on raw histograms)
    for pair in got:
        assert pair in truth, f"false positive {pair}"
    assert truth, "no near-dup pairs at this sf — fixture regressed"
    recall = len(got) / len(truth)
    assert recall >= 0.5, f"recall {recall} under the LSH floor"


def test_mm_embedding_finds_every_exact_duplicate(spark, tmp_path):
    # byte-identical payloads have identical centered vectors, hence
    # identical signatures in every table: found with probability 1.
    # The driver corpus plants exact dups only at sf0.1, so build a small
    # corpus with known byte-identical payloads (same schema as the lake).
    from psql_streamer_spark.sources.tables import load_table

    base = load_table(spark, "documents", SF_SMALL)
    clones = base.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    corpus = str(tmp_path / "corpus")
    base.unionByName(clones).repartition(4).write.parquet(
        f"{corpus}/documents.parquet"
    )
    dup = mm_dedup_binary(spark, corpus).filter(F.col("is_duplicate"))
    exact_pairs = {
        (min(r.canonical_doc_id, r.doc_id), max(r.canonical_doc_id, r.doc_id))
        for r in dup.collect()
    }
    assert len(exact_pairs) >= 5
    got = {
        (r.doc_a, r.doc_b) for r in mm_dedup_embedding(spark, corpus).collect()
    }
    missing = exact_pairs - got
    assert not missing, f"exact duplicates missed: {missing}"


def test_mm_embedding_mining_is_bucket_local(spark):
    plan = (
        mm_dedup_embedding(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # candidates come from grouped in-bucket screens, never a pair join
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
