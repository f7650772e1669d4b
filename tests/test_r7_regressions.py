"""Regression tests for the round-6 advice findings (ADVICE.md r7) and
the r6 verdict's one graded-weak item.

1. cosine_margin_candidates returned an EMPTY frame when centroid rows
   existed but every embedding was NULL; the crossJoin+window form it
   replaced (and the DuckDB oracle) assign every vector the lowest
   cent_id (all cosines NULL → NULL orders last → asc-cent_id tie-break).
2. The exact-substring span pair key k2 = xxhash64(shingle, 1) was a pure
   function of k1 = xxhash64(shingle) (Spark's multi-arg xxhash64 folds
   left-to-right with the running hash as the next seed), so the second
   key added zero collision protection. Fixed to xxhash64(1, shingle) —
   literal first — which hashes the shingle under a different effective
   seed.
3. dedup_incremental_lsh_pairs rebuilt full-corpus shingles + signatures
   per invocation and re-shuffled the banded corpus on every delta probe
   (measured super-linear at sf10: 90.6 s, ~N^1.7). It now probes the
   same LRU-materialized index frames dedup_minhash_lsh_pairs builds,
   with the banded index cached pre-partitioned on the probe-join key.
4. tools/oracle_check.compare_record set schema_match inconsistently
   across its early-return paths; column-name match and dtype-kind match
   are now separate uniform fields.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def test_margin_candidates_all_null_centroids_fall_back(spark):
    """Centroid rows exist but every embedding is NULL: every vector
    (NULL-embedded or not) must be assigned the lowest cent_id, exactly
    as the oracle's NULL-cosine ordering does — not an empty frame."""
    from psql_streamer_spark.operators.similarity import cosine_margin_candidates

    v = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.0, 1.0])],
        "vec_id long, e array<double>",
    )
    cent = spark.createDataFrame(
        [(9, None), (4, None)], "cent_id long, ce array<double>"
    )
    got = {
        (r.vec_id, r.cent_id)
        for r in cosine_margin_candidates(v, cent).collect()
    }
    assert got == {(0, 4), (1, 4), (2, 4)}


def test_margin_candidates_zero_centroid_rows_stay_empty(spark):
    """No centroid rows at all: no assignment is defined anywhere (the
    oracle's join produces nothing), so the screen must stay empty."""
    from psql_streamer_spark.operators.similarity import cosine_margin_candidates

    v = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, e array<double>")
    cent = spark.createDataFrame([], "cent_id long, ce array<double>")
    assert cosine_margin_candidates(v, cent).count() == 0


def test_substring_span_second_key_hashes_seed_first(spark):
    """The span-join pair key must hash the literal BEFORE the shingle:
    xxhash64(shingle, 1) is hashLong(1, k1) — a pure function of k1, so
    any k1 collision was automatically a k2 collision. The plan must
    contain the seed-first form and not the dependent form."""
    from psql_streamer_spark.operators.dedup import dedup_exact_substring_spans

    df = dedup_exact_substring_spans(spark, SF_SMALL)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "xxhash64(1, " in plan, plan
    assert ", 1)" not in plan.replace("xxhash64(1, ", ""), plan


def test_incremental_lsh_probes_cached_band_index(spark):
    """The incremental miner must (a) register its banded index in the
    shared LRU materialized-index registry (same frames the full miner
    builds — this is what killed the sf10 super-linear rebuild), (b) read
    it back from memory on the next invocation, and (c) agree exactly
    with the disk-bucketed materialized tier on the same delta."""
    from psql_streamer_spark.caching import INDEX_CACHE
    from psql_streamer_spark.operators.dedup import (
        dedup_incremental_lsh_pairs,
        dedup_incremental_materialized_pairs,
    )

    first = dedup_incremental_lsh_pairs(spark, SF_MEDIUM)
    rows_first = {(r.doc_a, r.doc_b) for r in first.collect()}

    app = spark.sparkContext.applicationId
    cached = {k[1] for k in INDEX_CACHE._lru if k[0] == app and k[2] == SF_MEDIUM}
    assert {"dedup_shingle_sets", "dedup_minhash_sig", "dedup_band_index"} <= cached

    warm = dedup_incremental_lsh_pairs(spark, SF_MEDIUM)
    plan = warm._jdf.queryExecution().executedPlan().toString()
    # the corpus band index and the verify's shingle-set arrays must both
    # come out of the cache (InMemoryTableScan), not a fresh parquet scan
    # + shingle/signature rebuild. (FileScan strings still APPEAR in the
    # printout — Spark 4 prints each cached relation's build plan beneath
    # its InMemoryTableScan node — so assert on the cache hits, not on
    # FileScan absence.)
    import re

    assert re.search(r"InMemoryTableScan \[band#", plan), plan
    assert re.search(r"InMemoryTableScan \[doc_id#\d+L?, ss#", plan), plan

    rows_warm = {(r.doc_a, r.doc_b) for r in warm.collect()}
    assert rows_warm == rows_first
    rows_mat = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental_materialized_pairs(spark, SF_MEDIUM).collect()
    }
    assert rows_warm == rows_mat
    assert len(rows_warm) > 0  # the sf0.01 delta genuinely collides


class _FakeSparkDF:
    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf


def test_compare_record_schema_and_kind_fields_are_uniform():
    """schema_match = column NAMES matched; kinds_match = dtype-kind check
    result (None when it could not run). Every early-return path must
    leave both fields in that uniform meaning."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from oracle_check import compare_record

    # column-set mismatch: schema_match False, kind check never ran
    rec, _ = compare_record(
        "t", _FakeSparkDF(pd.DataFrame({"a": [1]})), pd.DataFrame({"b": [1]})
    )
    assert rec["schema_match"] is False and rec["kinds_match"] is None

    # names match, kinds differ, row counts differ: schema True, kinds
    # False — the pre-fix code left schema_match True here with no way to
    # tell WHY the record failed
    rec, _ = compare_record(
        "t",
        _FakeSparkDF(pd.DataFrame({"a": [1, 2]})),
        pd.DataFrame({"a": [1.0]}),
    )
    assert rec["schema_match"] is True
    assert rec["kinds_match"] is False
    assert rec["rows_match"] is False

    # clean match
    rec, problems = compare_record(
        "t", _FakeSparkDF(pd.DataFrame({"a": [1]})), pd.DataFrame({"a": [1]})
    )
    assert problems == []
    assert rec["schema_match"] and rec["kinds_match"] and rec["hash_match"]


def _write_parquet(dirpath, name, pdf):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(dirpath / f"{name}.parquet"))


def test_wal_gap_audit_bucket_boundaries_match_single_window(spark, tmp_path):
    """The bucketed gap audit (lag within (table, floor(wal/4096)) + a
    boundary pass over the bucket summary) must count every consecutive
    pair exactly once. This corpus is built to cross every edge: gaps
    inside a bucket, a >5 gap across ADJACENT buckets, a =1 gap across
    adjacent buckets (must NOT count), and a gap spanning an EMPTY bucket.
    Expected values computed from the sorted positions by hand."""
    import pandas as pd

    # wal_position == event_id; 'click' -> insert (DML, survives filter)
    ids = [1, 3, 4090, 4100, 8191, 8192, 8193, 20000]
    pdf = pd.DataFrame(
        {
            "event_id": ids,
            "ts": pd.to_datetime("2026-01-01"),
            "user_id": [1] * len(ids),
            "event_type": ["click"] * len(ids),
            "value": [0.0] * len(ids),
            "props": ["{}"] * len(ids),
        }
    )
    _write_parquet(tmp_path, "events", pdf)
    from psql_streamer_spark.registry import all_queries

    out = all_queries()["cdc_wal_gap_audit"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0].asDict()
    # consecutive gaps: 2, 4087, 10 (boundary b0->b1), 4091, 1 (boundary
    # b1->b2), 1, 11807 (spans empty buckets) -> four gaps over 5
    assert row["n_events"] == 8
    assert row["n_gaps_over_5"] == 4
    assert row["max_gap"] == 11807


def test_wal_gap_audit_single_event_table_has_null_max_gap(spark, tmp_path):
    # one event -> no consecutive pairs: the aggregate must yield NULL
    # max_gap and zero gaps (parity with the single-window LAG form)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [42],
            "ts": pd.to_datetime("2026-01-01"),
            "user_id": [1],
            "event_type": ["click"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    _write_parquet(tmp_path, "events", pdf)
    from psql_streamer_spark.registry import all_queries

    row = all_queries()["cdc_wal_gap_audit"](spark, str(tmp_path)).collect()[0]
    assert row["n_events"] == 1
    assert row["n_gaps_over_5"] == 0
    assert row["max_gap"] is None


def test_top_ngrams_salted_topk_is_lossless_under_total_tie(spark, tmp_path):
    """Degenerate corpus where EVERY gram count ties at 1 — the worst case
    for any two-phase top-k. The salted phase-1 window must keep every
    gram that can reach the true top-5 (both phases rank by the same
    (n DESC, gram ASC) total order, so per-cell survivors cover it) and
    produce the 5 lexicographically-smallest grams, identical to a naive
    single window over the full vocabulary."""
    import pandas as pd

    texts = [f"w{i:02d}a w{i:02d}b w{i:02d}c w{i:02d}d" for i in range(40)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    _write_parquet(tmp_path, "documents", pdf)

    grams = []
    for t in texts:
        ws = t.lower().split()
        grams += [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
    assert len(set(grams)) == len(grams)  # all counts tie at 1
    expected = sorted(grams)[:5]

    from psql_streamer_spark.registry import all_queries

    out = (
        all_queries()["text_top_ngrams_per_source"](spark, str(tmp_path))
        .orderBy("rank")
        .collect()
    )
    assert [r["gram"] for r in out] == expected
    assert [r["n"] for r in out] == [1] * 5
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]


def test_top_ngrams_with_fewer_grams_than_topk(spark, tmp_path):
    # fewer distinct grams than TOP_K: the two-phase top-k must return
    # them all, correctly ranked, not require 5 survivors per cell
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["alpha beta gamma delta"],  # exactly 2 grams
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [22],
        }
    )
    _write_parquet(tmp_path, "documents", pdf)
    from psql_streamer_spark.registry import all_queries

    out = (
        all_queries()["text_top_ngrams_per_source"](spark, str(tmp_path))
        .orderBy("rank")
        .collect()
    )
    assert [r["gram"] for r in out] == ["alpha beta gamma", "beta gamma delta"]


# ---------------------------------------------------------------------------
# Low-cardinality-window-wall sweep, part 3 (after top_ngrams and
# wal_gap_audit): the full-ranking customer windows decompose over
# order-respecting acctbal buckets, and the per-query top-k windows
# (similarity / BM25) rank through functions/ranking.salted_topk. Both
# forms must be bit-identical to the naive single-window computation,
# ties and edge cases included.
# ---------------------------------------------------------------------------


def _customer_lake(tmp_path, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    _write_parquet(tmp_path, "customer", pdf)


# ties inside a bucket (400.0 x2), ties exactly ON the bucket-boundary
# value (200.0 = bucket edge, x3 in one segment + once in another), a
# value one cent below the edge (199.99 — adjacent bucket), a single-row
# segment, a duplicated FULL order key (custkey 5 twice -> peers > 1 for
# cume_dist), and total n = 13 (ntile remainder 1: the first tile takes
# floor(13/4)+1 = 4 rows).
_TIE_ROWS = [
    (0, "HOUSEHOLD", -994.28),
    (1, "AUTOMOBILE", 200.0),
    (2, "AUTOMOBILE", 200.0),
    (3, "AUTOMOBILE", 200.0),
    (4, "AUTOMOBILE", 199.99),
    (5, "AUTOMOBILE", 400.0),
    (5, "AUTOMOBILE", 400.0),
    (7, "AUTOMOBILE", -10.0),
    (8, "AUTOMOBILE", 123.45),
    (9, "BUILDING", 200.0),
    (10, "MACHINERY", 999.0),
    (11, "MACHINERY", 999.0),
    (12, "MACHINERY", 9999.99),
]


def test_rank_ntile_bucket_decomposition_matches_single_window(spark, tmp_path):
    from pyspark.sql import Window as W

    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.sources.tables import load_table

    _customer_lake(tmp_path, _TIE_ROWS)
    got = sorted(
        map(
            tuple,
            all_queries()["window_rank_dense_ntile"](spark, str(tmp_path))
            .select("c_custkey", "c_acctbal", "bal_rank", "bal_dense_rank", "bal_quartile")
            .collect(),
        )
    )
    c = load_table(spark, "customer", str(tmp_path))
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wg = W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    naive = sorted(
        map(
            tuple,
            c.select(
                "c_custkey",
                "c_acctbal",
                F.rank().over(w).cast("long").alias("bal_rank"),
                F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
                F.ntile(4).over(wg).cast("long").alias("bal_quartile"),
            ).collect(),
        )
    )
    assert got == naive


def test_rank_ntile_decomposition_total_smaller_than_tiles(spark, tmp_path):
    """n = 3 < 4 tiles: the closed-form ntile's q = floor(n/4) = 0 branch
    (every tile has at most one row; the otherwise-branch divisor must
    not divide by zero even though the branch is never taken)."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.registry import all_queries

    _customer_lake(
        tmp_path,
        [(1, "AUTOMOBILE", 5.0), (2, "AUTOMOBILE", 5.0), (3, "BUILDING", 7.0)],
    )
    out = {
        r.c_custkey: r.bal_quartile
        for r in all_queries()["window_rank_dense_ntile"](spark, str(tmp_path)).collect()
    }
    # global order: (7.0, ck3), (5.0, ck1), (5.0, ck2) -> tiles 1, 2, 3
    assert out == {3: 1, 1: 2, 2: 3}


def test_percent_rank_cume_dist_decomposition_matches_single_window(spark, tmp_path):
    from pyspark.sql import Window as W

    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.sources.tables import load_table

    _customer_lake(tmp_path, _TIE_ROWS)
    got = sorted(
        map(
            tuple,
            all_queries()["window_percent_rank_cume_dist"](spark, str(tmp_path))
            .select("c_custkey", "c_mktsegment", "bal_pct_rank", "bal_cume_dist")
            .collect(),
        )
    )
    c = load_table(spark, "customer", str(tmp_path))
    w = W.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    naive = sorted(
        map(
            tuple,
            c.select(
                "c_custkey",
                "c_mktsegment",
                F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
                F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
            ).collect(),
        )
    )
    assert got == naive


def test_salted_topk_matches_single_window(spark):
    """Lossless two-phase top-k: bit-identical to the naive group-only
    ROW_NUMBER window under a total order, including a group smaller
    than k and whatever salt-cell distribution xxhash64 deals."""
    from pyspark.sql import Window as W

    from psql_streamer_spark.functions.ranking import salted_topk

    rows = [(g, i, (i * 37 + g * 11) % 23) for g in range(3) for i in range(40)]
    rows += [(9, 0, 5), (9, 1, 5)]  # group with fewer rows than k
    df = spark.createDataFrame(rows, "grp long, id long, score long")
    order = [F.desc("score"), F.asc("id")]
    got = sorted(
        map(
            tuple,
            salted_topk(df, ["grp"], order, 5, F.col("id"), n_salts=8)
            .select("grp", "id", "score", "rank")
            .collect(),
        )
    )
    naive = sorted(
        map(
            tuple,
            df.withColumn(
                "rank", F.row_number().over(W.partitionBy("grp").orderBy(*order))
            )
            .filter(F.col("rank") <= 5)
            .select("grp", "id", "score", "rank")
            .collect(),
        )
    )
    assert got == naive


def test_minmax_broadcast_stats_matches_grouped_map_incl_null_group(spark, tmp_path):
    """The broadcast-stats production tier must agree with the
    applyInPandas demonstration tier row-for-row, INCLUDING rows whose
    event_type is NULL — groupBy and the oracle's window both treat NULL
    as one group, so the null-safe join must not drop it."""
    import math

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7, 8],
            "ts": pd.to_datetime("2026-01-01"),
            "user_id": [1] * 8,
            "event_type": ["a", "a", None, None, "b", "b", "c", "c"],
            "value": [1.0, 3.0, 10.0, 20.0, 5.0, 7.0, 4.0, 4.0],
            "props": ["{}"] * 8,
        }
    )
    _write_parquet(tmp_path, "events", pdf)
    from psql_streamer_spark.registry import all_queries

    q = all_queries()

    def by_id(name):
        return {
            r.event_id: (r.event_type, r.value, r.norm_value)
            for r in q[name](spark, str(tmp_path)).collect()
        }

    demo = by_id("udf_minmax_normalize_per_group")
    prod = by_id("udf_minmax_normalize_broadcast_stats")
    assert set(demo) == set(prod) == {1, 2, 3, 4, 5, 6, 7, 8}
    for k in (1, 2, 3, 4, 5, 6):  # non-degenerate groups: exact parity
        assert demo[k][0] == prod[k][0] and demo[k][1] == prod[k][1]
        assert demo[k][2] == prod[k][2]
    # spot-check values: NULL group spans 10..20
    assert prod[3][2] == 0.0 and prod[4][2] == 1.0
    # degenerate all-equal group "c" (hi == lo): all three tiers agree on
    # NULL — numpy 0/0 = NaN becomes Arrow NULL on the grouped-map return
    # path (NaN is pandas' null sentinel), try_divide yields NULL in the
    # production tier, and DuckDB v1.0.0 float x/0 is NULL in the oracle
    for k in (7, 8):
        assert demo[k][2] is None
        assert prod[k][2] is None


def test_rank_decompositions_match_native_on_random_tie_heavy_frame(spark, tmp_path):
    """Randomized cross-check of both bucket decompositions against the
    native single-window forms: values drawn from a tie-heavy pool that
    includes bucket-boundary values AND NULL balances (the sentinel-bucket
    path: NULL sorts last under DESC, first under ASC, exactly where
    Spark's window ordering puts it), duplicate custkeys, three segments
    plus NULL segment (one partition group — the offset joins must be
    null-safe or its rows silently vanish).
    Seeded, deterministic."""
    import random

    import pandas as pd
    from pyspark.sql import Window as W

    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.sources.tables import load_table

    rng = random.Random(41)
    vals = [-994.28, -200.0, -10.0, 0.0, 199.99, 200.0, 200.01, 999.0, 9999.99, None]
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY", None]
    rows = [
        (rng.randrange(20), rng.choice(segs), rng.choice(vals)) for _ in range(80)
    ]
    pdf = pd.DataFrame(rows, columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    _write_parquet(tmp_path, "customer", pdf)
    q = all_queries()
    c = load_table(spark, "customer", str(tmp_path))

    key = repr  # None-safe total order over result tuples

    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wg = W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    naive_rank = sorted(
        map(
            tuple,
            c.select(
                "c_custkey",
                "c_acctbal",
                F.rank().over(w).cast("long").alias("bal_rank"),
                F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
                F.ntile(4).over(wg).cast("long").alias("bal_quartile"),
            ).collect(),
        ),
        key=key,
    )
    got_rank = sorted(
        map(
            tuple,
            q["window_rank_dense_ntile"](spark, str(tmp_path))
            .select("c_custkey", "c_acctbal", "bal_rank", "bal_dense_rank", "bal_quartile")
            .collect(),
        ),
        key=key,
    )
    assert got_rank == naive_rank

    wp = W.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    naive_pct = sorted(
        map(
            tuple,
            c.select(
                "c_custkey",
                "c_mktsegment",
                F.round(F.percent_rank().over(wp), 6).alias("bal_pct_rank"),
                F.round(F.cume_dist().over(wp), 6).alias("bal_cume_dist"),
            ).collect(),
        ),
        key=key,
    )
    got_pct = sorted(
        map(
            tuple,
            q["window_percent_rank_cume_dist"](spark, str(tmp_path))
            .select("c_custkey", "c_mktsegment", "bal_pct_rank", "bal_cume_dist")
            .collect(),
        ),
        key=key,
    )
    assert got_pct == naive_pct
