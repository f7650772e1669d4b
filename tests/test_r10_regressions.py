"""Round-10 regression pins for the r9-advice semantic fixes: the
hot-key sampled-count floor (ceil + hard floor of 2, not int truncation)
and the null-safe group-key join in the split HLL aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hot_floor_never_one_for_accepted_params():
    """For every accepted (threshold, fraction) pair — product >= 1 — the
    sampled-count floor must be >= 2, so a singleton sample count can
    never flag a key hot. With int() truncation, any product in [1, 2)
    (e.g. threshold=10_000, fraction=0.00015 -> 1.5) degenerated the
    floor to 1 and up to sample_fraction * |big| cold singletons were
    salted, replicating small-side rows buckets x for no benefit."""
    from psql_streamer_spark.operators.asof import _hot_floor

    # the [1, 2) degeneracy band the truncation bug lived in
    assert _hot_floor(10_000, 0.00015) == 2  # product 1.5
    assert _hot_floor(150, 0.01) == 2  # product 1.5
    assert _hot_floor(100, 0.01) == 2  # product exactly 1
    assert _hot_floor(199, 0.01) == 2  # product 1.99
    # above the band: ceil, not truncate (2.5 -> 3, not 2)
    assert _hot_floor(250, 0.01) == 3
    assert _hot_floor(10_000, 0.01) == 100
    for thr, frac in [(10_000, 0.00015), (150, 0.01), (101, 0.01)]:
        assert _hot_floor(thr, frac) >= 2


def test_salted_join_singletons_not_flagged_hot_in_degenerate_band(spark):
    """End-to-end: with product = 1.5 (inside the old degeneracy band)
    and an all-cold corpus of singleton keys, the salted join must leave
    the small side UNREPLICATED. Count parity alone cannot observe that
    (replication preserved the joined count pre-fix too — r10 advice),
    so this asserts the DETECTOR's collected hot set is empty for the
    singleton corpus at the boundary params — an empty hot set is
    exactly "no replication" (only flagged keys' small-side rows fan
    out) — then keeps the end-to-end parity check."""
    from psql_streamer_spark.operators.asof import (
        _detect_hot_keys,
        salted_join,
    )

    big = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    small = spark.range(2_000).select(
        F.col("id").alias("sk"), (F.col("id") * 10).alias("attr")
    )
    # the mechanism pin: no singleton key may be flagged hot, so the
    # collected hot set — the ONLY thing that triggers replication —
    # must be empty (pre-fix it held every sampled key, ~1% of 2000)
    hot = _detect_hot_keys(
        big, "k", hot_row_threshold=150, sample_fraction=0.01,
        max_hot_keys=100_000,
    )
    assert hot == []
    out = salted_join(
        big,
        small,
        big_on="k",
        small_on="sk",
        buckets=8,
        salt_by="payload",
        hot_row_threshold=150,
        sample_fraction=0.01,  # product 1.5: the [1,2) band
    )
    plain = big.join(small, F.col("k") == F.col("sk"))
    assert out.count() == plain.count() == 2_000


def test_salted_join_still_rejects_product_below_one(spark):
    from psql_streamer_spark.operators.asof import salted_join

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(10).select(F.col("id").alias("sk"))
    with pytest.raises(ValueError, match=">= 1"):
        salted_join(
            big, small, big_on="k", small_on="sk",
            hot_row_threshold=10, sample_fraction=0.01,
        ).count()


def test_agg_approx_distinct_users_keeps_null_group(spark, tmp_path):
    """groupBy keeps a NULL event_type group; the split-into-two-
    aggregations form joins exact and approx counts — a plain equality
    join key silently dropped the NULL group (r9 advice). The eqNullSafe
    join must emit it with correct counts."""
    from psql_streamer_spark.operators.udfs import agg_approx_distinct_users

    rows = [(i, "click" if i % 3 else None) for i in range(300)]
    spark.createDataFrame(rows, "user_id long, event_type string").write.parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r.event_type: r for r in agg_approx_distinct_users(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"click", None}
    assert got[None].exact_users == 100  # ids 0, 3, 6, ... 297
    assert got["click"].exact_users == 200
    assert got[None].approx_within_5pct and got["click"].approx_within_5pct


def test_simhash_pairs_stable_under_composition(spark):
    """r10 find: composing the (previously lazily-persisted) simhash pair
    lineage into ONE cold action together with the exact-Jaccard ground-
    truth tree and a left join made Spark's exchange/stage reuse falsely
    unify canonically-colliding stages from the shared shingle lineage —
    the pair-level distinct ran partial-only and band-duplicate pairs
    survived (56 instead of 20 at sf0.01; gone with
    spark.sql.exchange.reuse=false). The fix materializes the simhash
    index eagerly (INDEX_CACHE), so every consumer reads the computed
    frame. This test rebuilds from a cleared cache and asserts the
    composed single-action count equals the standalone count."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.caching import INDEX_CACHE
    from psql_streamer_spark.operators.dedup import (
        dedup_ngram_jaccard_pairs,
        dedup_minhash_lsh_pairs,
        dedup_simhash_pairs,
    )
    from tests.conftest import SF_MEDIUM

    INDEX_CACHE.clear()
    standalone = dedup_simhash_pairs(spark, SF_MEDIUM).count()

    INDEX_CACHE.clear()  # force the composed plan to build cold
    sh = dedup_simhash_pairs(spark, SF_MEDIUM).select("doc_a", "doc_b")
    lsh = dedup_minhash_lsh_pairs(spark, SF_MEDIUM).select("doc_a", "doc_b")
    truth = dedup_ngram_jaccard_pairs(spark, SF_MEDIUM).select("doc_a", "doc_b")
    approx = lsh.withColumn("tier", F.lit("m")).unionByName(
        sh.withColumn("tier", F.lit("p"))
    )
    np_ = approx.groupBy("tier").agg(F.count("*").alias("n_pairs"))
    nt = truth.agg(F.count("*").alias("n_truth"))
    tiers = spark.createDataFrame([("m",), ("p",)], "tier string")
    composed = {
        r.tier: r.n_pairs
        for r in tiers.crossJoin(nt).join(np_, "tier", "left").collect()
    }
    assert composed["p"] == standalone, (composed, standalone)


def test_simhash64_pairs_stable_under_composition(spark):
    """Same hazard, production-width tier: pre-fix the composed cold plan
    read 31 pairs vs 14 standalone at sf0.01."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.caching import INDEX_CACHE
    from psql_streamer_spark.operators.dedup import (
        dedup_ngram_jaccard_pairs,
        dedup_simhash64_pairs,
    )
    from tests.conftest import SF_MEDIUM

    INDEX_CACHE.clear()
    standalone = dedup_simhash64_pairs(spark, SF_MEDIUM).count()

    INDEX_CACHE.clear()
    sh = dedup_simhash64_pairs(spark, SF_MEDIUM).select("doc_a", "doc_b")
    truth = dedup_ngram_jaccard_pairs(spark, SF_MEDIUM).select("doc_a", "doc_b")
    np_ = sh.withColumn("tier", F.lit("p")).groupBy("tier").agg(
        F.count("*").alias("n_pairs")
    )
    nt = truth.agg(F.count("*").alias("n_truth"))
    tiers = spark.createDataFrame([("p",)], "tier string")
    composed = {
        r.tier: r.n_pairs
        for r in tiers.crossJoin(nt).join(np_, "tier", "left").collect()
    }
    assert composed["p"] == standalone, (composed, standalone)


def test_quality_report_plus_incremental_miner_fit_cache_without_eviction(spark):
    """r10 advice (closed r11 by raising the bound 8 -> 16): one
    dedup_quality_report pass holds 9 registry entries (shingle sets,
    minhash sig/cand/verified, both simhash sig/pairs plus the wide
    pairs); at max_entries=8 the INCREMENTAL miner's band index — the
    very next thing a daily pipeline touches — evicted and unpersisted
    a frame the report still referenced, silently re-paying eager index
    builds. This runs the full report THEN the incremental miner and
    asserts every entry inserted by the report is still registered and
    still materialized (no eviction churn under the production
    composition)."""
    from psql_streamer_spark.caching import INDEX_CACHE
    from psql_streamer_spark.operators.dedup import (
        dedup_incremental_lsh_pairs,
        dedup_quality_report,
    )
    from tests.conftest import SF_MEDIUM

    INDEX_CACHE.clear()
    dedup_quality_report(spark, SF_MEDIUM).count()
    with INDEX_CACHE._lock:
        report_keys = set(INDEX_CACHE._lru)
    assert len(report_keys) >= 8  # the pass that exactly consumed the old bound
    dedup_incremental_lsh_pairs(spark, SF_MEDIUM).count()
    with INDEX_CACHE._lock:
        after = dict(INDEX_CACHE._lru)
    missing = report_keys - set(after)
    assert not missing, f"evicted under routine composition: {missing}"
    # still materialized, not just registered (eviction unpersists)
    for key in report_keys:
        assert after[key].storageLevel.useMemory or after[key].storageLevel.useDisk
    INDEX_CACHE.clear()
