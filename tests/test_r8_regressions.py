"""Round-8 regression pins for the r7 ADVICE findings.

1. salted_join evaluated its sampled hot-key frame independently on the
   big-side and small-side joins; under nondeterministic lineage (task
   retry, round-robin repartition) the two evaluations could disagree and
   a key flagged hot on only one side would silently lose its matches on
   salts 1..buckets-1. The hot set is now collected once and rebuilt as a
   literal frame, so no Sample node may survive into the join plan.
2. The uncapped GROUND-TRUTH substring-span miner groups each shingle's
   full posting list into one aggregation buffer; at corpus scale a
   boilerplate shingle means single-task OOM instead of graceful spill.
   It must fail fast with the production tier named.
3. cosine_margin_candidates silently dropped NULL-cent_id centroid rows
   from the matmul; a live-embedding row without an id could hold the
   true argmax. The model-frame contract (non-NULL cent_id) is now
   asserted loudly.
"""

from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"


def test_salted_join_hot_set_is_materialized_once(spark):
    """The join plan must not contain a Sample node: the seeded sample
    runs eagerly at call time, and BOTH sides probe one literal hot-key
    frame (a LocalRelation), so the two broadcasts provably agree."""
    from psql_streamer_spark.operators.asof import salted_join
    from psql_streamer_spark.sources.tables import load_table

    l = load_table(spark, "lineitem", SF_SMALL).select(
        "l_orderkey", "l_linenumber"
    )
    o = load_table(spark, "orders", SF_SMALL).select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        l, o, big_on="l_orderkey", small_on="o_orderkey",
        buckets=4, salt_by="l_linenumber",
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Sample" not in plan, (
        "hot-key sample leaked into the join plan — it would be "
        "re-evaluated independently per side:\n" + plan
    )
    # and the degenerate no-hot-keys path still equals the plain join
    expected = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected


def test_salted_join_hot_path_still_correct(spark):
    """Skewed frame: one key holds half the rows, well over the sampled
    threshold — result must stay row-identical to the plain join."""
    from psql_streamer_spark.operators.asof import salted_join

    n = 20_000
    big = spark.range(n).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 7 ELSE id END AS k", "id AS payload"
    )
    small = spark.range(50).selectExpr("id AS sk", "id * 10 AS attr")
    out = salted_join(
        big, small, big_on="k", small_on="sk",
        buckets=4, salt_by="payload",
        hot_row_threshold=100, sample_fraction=0.05,
    )
    plain = big.join(small, big.k == small.sk)
    assert out.count() == plain.count()
    assert (
        out.groupBy("k").count().exceptAll(plain.groupBy("k").count()).count()
        == 0
    )


def test_uncapped_span_miner_guards_corpus_scale(spark, monkeypatch):
    """Above GROUND_TRUTH_MAX_DOCS documents the uncapped tier must fail
    fast with the capped production tier named, not die mid-shuffle."""
    from psql_streamer_spark.operators import dedup

    monkeypatch.setattr(dedup, "GROUND_TRUTH_MAX_DOCS", 1)
    with pytest.raises(ValueError, match="dedup_exact_substring_spans_capped"):
        dedup.dedup_exact_substring_spans(spark, SF_SMALL)


def test_uncapped_span_miner_runs_below_guard(spark):
    """At sample scale (sf0.001) the ground-truth tier still runs."""
    from psql_streamer_spark.operators.dedup import dedup_exact_substring_spans

    assert dedup_exact_substring_spans(spark, SF_SMALL).count() >= 0


def test_margin_candidates_reject_null_cent_id(spark):
    """A NULL-cent_id centroid row with a live embedding could hold the
    best cosine; the screen must refuse the frame instead of silently
    dropping the row (and with it, possibly, the true argmax)."""
    from psql_streamer_spark.operators.similarity import (
        cosine_margin_candidates,
    )

    v = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, e array<double>"
    )
    cent = spark.createDataFrame(
        [(None, [1.0, 0.0]), (3, [0.0, 1.0])],
        "cent_id long, ce array<double>",
    )
    with pytest.raises(ValueError, match="NULL cent_id"):
        cosine_margin_candidates(v, cent).count()
