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
