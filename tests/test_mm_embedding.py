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


def test_mm_bucket_index_replica_collapse(spark, tmp_path):
    """r17 index collapse: byte-identical payloads store ONE posting per
    replica group (gid = the group's min doc_id) plus a (gid, doc_id)
    members sidecar — posting rows are O(unique x tables), never
    O(N x tables), so a replica cluster occupies one index row per
    table no matter how many members it has."""
    from psql_streamer_spark.operators.multimodal import (
        _mm_hist_frame,
        mm_bucket_index_table,
    )
    from psql_streamer_spark.operators.similarity import LSH_TABLES
    from psql_streamer_spark.sources.tables import load_table

    base = load_table(spark, "documents", SF_SMALL)
    seed = base.limit(1).select("text", "lang", "source", "n_chars")
    clones = (
        spark.range(2_000_000, 2_000_030)
        .withColumnRenamed("id", "doc_id")
        .crossJoin(seed)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    corpus = str(tmp_path / "replicas")
    base.unionByName(clones).repartition(4).write.parquet(
        f"{corpus}/documents.parquet"
    )
    hist = _mm_hist_frame(spark, corpus)
    n_hist = hist.count()
    u = hist.select("h").distinct().count()
    assert n_hist - u >= 30, "planted replicas must share a histogram"
    table = mm_bucket_index_table(spark, corpus)
    assert spark.table(table).count() == u * LSH_TABLES
    members = spark.table(f"{table}__members")
    assert members.count() == n_hist
    # gid is the min member id of its group, and every gid has postings
    bad = (
        members.groupBy("gid")
        .agg(F.min("doc_id").alias("mn"))
        .filter(F.col("gid") != F.col("mn"))
    )
    assert bad.count() == 0
    posted = {r.gid for r in spark.table(table).select("gid").distinct().collect()}
    assert posted == {r.gid for r in members.select("gid").distinct().collect()}


def test_hist_oracle_is_byte_true_on_non_ascii(spark, tmp_path):
    """The oracle walks UTF-8 BYTES (hex pairs), not codepoints — on a
    non-ASCII corpus its histograms must equal the Spark side's
    np.frombuffer(uint8) exactly."""
    import duckdb

    from psql_streamer_spark.operators.multimodal import (
        _SQL_MM_DEDUP_EMBEDDING,
        _mm_hist_frame,
    )

    rows = [
        (1, "café au lait and a résumé", "xx", "src1", 25),
        (2, "café au lait and a résumé", "xx", "src1", 25),  # exact dup
        (3, "naïve approach to tokenization über alles", "xx", "src2", 42),
        (4, "plain ascii text with no accents at all", "xx", "src3", 40),
        (5, "é", "xx", "src4", 1),  # 1 char but 2 BYTES: included by bytes
    ]
    corpus = str(tmp_path / "nonascii")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{corpus}/documents.parquet")

    got = {r.doc_id: list(r.h) for r in _mm_hist_frame(spark, corpus).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus}/documents.parquet/*.parquet')"
    )
    hist_sql = _SQL_MM_DEDUP_EMBEDDING.split("tot AS")[0].rstrip().rstrip(
        ","
    ) + (" SELECT doc_id, h FROM hist")
    want = {int(d): list(h) for d, h in con.execute(hist_sql).fetchall()}
    assert got == want
    assert 5 in got  # the 1-char/2-byte doc is histogrammed on both sides
    # and the full op agrees with its oracle end to end on this corpus
    pairs = {
        (r.doc_a, r.doc_b)
        for r in __import__(
            "psql_streamer_spark.operators.multimodal", fromlist=["x"]
        ).mm_dedup_embedding(spark, corpus).collect()
    }
    oracle_pairs = {
        (int(a), int(b))
        for a, b, _ in con.execute(_SQL_MM_DEDUP_EMBEDDING).fetchall()
    }
    assert pairs == oracle_pairs
    assert (1, 2) in pairs  # the exact duplicate survives end to end


def test_mm_incremental_equals_full_miner_on_delta_pairs(spark):
    """The incremental probe (materialized posting table + bucket-local
    delta join + candidate-only verify) must emit exactly the full
    miner's pairs that touch the ingest delta — same pairs, same cosines
    (identical raw-histogram verify expression)."""
    from psql_streamer_spark.operators.dedup import (
        DELTA_BUCKET,
        DELTA_BUCKETS,
    )
    from psql_streamer_spark.operators.mlprep import md5_bucket
    from psql_streamer_spark.operators.multimodal import (
        mm_dedup_embedding,
        mm_dedup_embedding_incremental,
    )
    from psql_streamer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"  # smallest SF with delta-touching pairs
    full = mm_dedup_embedding(spark, sf).collect()
    delta_ids = {
        r.doc_id
        for r in load_table(spark, "documents", sf)
        .select("doc_id")
        .filter(md5_bucket(F.col("doc_id"), DELTA_BUCKETS) == DELTA_BUCKET)
        .collect()
    }
    want = {
        (r.doc_a, r.doc_b): r.cosine
        for r in full
        if r.doc_a in delta_ids or r.doc_b in delta_ids
    }
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in mm_dedup_embedding_incremental(spark, sf).collect()
    }
    assert got == want
    assert got, "sf0.01 must have delta-touching near-dup pairs"


def test_mm_incremental_candidate_screen_is_bucket_local(spark):
    """Delta candidate mining must screen bucket-local on the posting
    table: the skey groupBy rides the table's own bucketing (no exchange
    on skey anywhere — the corpus index is never re-shuffled), the heavy
    vector column `e` never crosses an exchange (the r17 collapse's §8
    contract: group decisions travel, member expansion shuffles only
    long ids), and the bucketed scan feeds the pandas screen directly."""
    from psql_streamer_spark.operators.multimodal import (
        mm_incremental_candidates,
    )

    cand = mm_incremental_candidates(spark, SF_SMALL)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert shuffles, plan  # at least the member-pair distinct
    for line in shuffles:
        assert "skey" not in line, shuffles
        assert "e#" not in line, shuffles  # vectors stay bucket-local
    assert plan.count("Bucketed: true") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan
