"""Parametrized composition-stability sweep (r10 verdict task 4).

The r10 round found a silent-wrong-results class: an operator's lazily
persisted, multi-reference lineage, composed COLD into one action
together with another tree that shares its source lineage (the quality
report's union + per-tier counts), tripped Spark's exchange/stage reuse
into falsely unifying canonically-colliding stages — the pair-level
distinct ran partial-only and band-duplicate pairs survived (56 vs 20
at sf0.01). It was caught only because dedup_quality_report happened to
compose the two simhash tiers; this sweep applies the same probe to
EVERY pair-mining / top-k tier so the next lazily-persisted lineage
cannot ship unprobed.

Shape per tier: (1) cleared index cache, isolated count; (2) cleared
cache again, the tier's frame unioned with a SHARED-LINEAGE partner
tree (the exact-Jaccard miner for document tiers, the exact cosine
tiers for embedding tiers — both read the same parquet scan and shingle
/ vector sub-lineages) into ONE cold action with per-tier counts — the
dedup_quality_report shape that triggered the bug. Counts must match.

Cost note: this sweep is ~18 cases at sf0.01 (500 docs / 200 vectors);
each case is two small actions. The iterative k-means tier is included
— its training collects driver-side, so its composed plan embeds
literal centroids and must be count-stable like the rest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM

# (tier, pair columns, shared-lineage partner, partner columns).
# Partners: document tiers compose with the exact-Jaccard ground truth
# (shares the documents scan + shingle lineage — the r10 trigger);
# embedding pair tiers with the brute-force top-k (shares the
# embeddings scan + norm lineage); top-k tiers with the exact cosine
# pair miner (same sharing, opposite direction). BM25 composes with the
# Jaccard tree (shares the documents scan + tokenization lineage).
_DOC = ("doc_a", "doc_b")
_VEC = ("vec_a", "vec_b")
_TOPK = ("query_id", "neighbor_id")
_JACC = ("dedup_ngram_jaccard_pairs", _DOC)
_BRUTE = ("sim_bruteforce_topk", _TOPK)
_COS = ("dedup_embedding_cosine_pairs", _VEC)

TIERS = [
    ("dedup_ngram_jaccard_pairs", _DOC, "dedup_minhash_lsh_pairs", _DOC),
    ("dedup_ngram_jaccard_pairs_capped", _DOC, *_JACC),
    ("dedup_ngram_containment_pairs", _DOC, *_JACC),
    ("dedup_ngram_containment_pairs_capped", _DOC, *_JACC),
    ("dedup_levenshtein_pairs", _DOC, *_JACC),
    ("dedup_minhash_lsh_pairs", _DOC, *_JACC),
    ("dedup_simhash_pairs", _DOC, *_JACC),
    ("dedup_simhash64_pairs", _DOC, *_JACC),
    ("dedup_simhash64_pairs_wide", _DOC, *_JACC),
    ("dedup_incremental_lsh_pairs", _DOC, *_JACC),
    ("dedup_incremental_materialized_pairs", _DOC, *_JACC),
    ("text_bm25_topk", ("query_id", "doc_id"), *_JACC),
    ("dedup_embedding_cosine_pairs", _VEC, *_BRUTE),
    ("dedup_embedding_cosine_pairs_blocked", _VEC, *_BRUTE),
    ("dedup_embedding_lsh_pairs", _VEC, *_BRUTE),
    ("sim_bruteforce_topk", _TOPK, *_COS),
    ("sim_lsh_topk", _TOPK, *_COS),
    ("sim_lsh_topk_wide", _TOPK, *_COS),
    ("sim_ivf_topk", _TOPK, *_COS),
    ("sim_ivf_kmeans_topk", _TOPK, *_COS),
]


@pytest.mark.parametrize(
    "name,cols,partner,pcols", TIERS, ids=[t[0] for t in TIERS]
)
def test_tier_count_stable_under_composition(spark, name, cols, partner, pcols):
    from psql_streamer_spark.caching import INDEX_CACHE
    from psql_streamer_spark.registry import all_queries

    queries = all_queries()

    INDEX_CACHE.clear()
    standalone = queries[name](spark, SF_MEDIUM).count()

    INDEX_CACHE.clear()  # force the composed plan to build cold
    tier = queries[name](spark, SF_MEDIUM).select(
        F.col(cols[0]).cast("long").alias("a"),
        F.col(cols[1]).cast("long").alias("b"),
    )
    shared = queries[partner](spark, SF_MEDIUM).select(
        F.col(pcols[0]).cast("long").alias("a"),
        F.col(pcols[1]).cast("long").alias("b"),
    )
    union = tier.withColumn("tier", F.lit("t")).unionByName(
        shared.withColumn("tier", F.lit("g"))
    )
    composed = {
        r.tier: r.n
        for r in union.groupBy("tier").agg(F.count("*").alias("n")).collect()
    }
    assert composed.get("t", 0) == standalone, (name, composed, standalone)
