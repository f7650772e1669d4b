"""Empty-input robustness: every registered query must run (and produce a
well-formed, usually empty, result) against a lake whose tables all have
ZERO rows.

At 100 TB this is not a corner case — it is Tuesday: an empty ingest day,
a partition-pruned scan that matched nothing, a filter that eliminated a
whole source. An operator that crashes on empty input (max() of nothing,
head of an empty list, divide-by-count-zero, k-means with no seed
vectors) takes the whole pipeline run down with it. This sweep pins the
invariant for the entire registry at once, so a new operator that
regresses it fails CI immediately."""

from __future__ import annotations

import pytest

from psql_streamer_spark.registry import all_queries

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def empty_lake(tmp_path_factory):
    """Schema-faithful parquet tables with zero rows (LIMIT 0 copies)."""
    import duckdb

    from tests.conftest import SF_SMALL

    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SF_SMALL}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_lake):
    from psql_streamer_spark.caching import INDEX_CACHE

    failures = []
    for name, fn in sorted(all_queries().items()):
        try:
            fn(spark, empty_lake).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001 - collecting the sweep
            failures.append(f"{name}: {str(exc).splitlines()[0][:120]}")
    INDEX_CACHE.clear()
    assert not failures, "\n".join(failures)


_NULL_SPECS = {
    "events": """SELECT event_id,
        CASE WHEN event_id%2=0 THEN NULL ELSE ts END AS ts, user_id,
        CASE WHEN event_id%3=0 THEN NULL ELSE event_type END AS event_type,
        CASE WHEN event_id%5=0 THEN NULL ELSE value END AS value,
        CASE WHEN event_id%7=0 THEN NULL ELSE props END AS props FROM t""",
    "documents": """SELECT doc_id,
        CASE WHEN doc_id%2=0 THEN NULL ELSE text END AS text,
        CASE WHEN doc_id%3=0 THEN NULL ELSE lang END AS lang,
        CASE WHEN doc_id%5=0 THEN NULL ELSE source END AS source,
        n_chars FROM t""",
    "embeddings": """SELECT vec_id,
        CASE WHEN vec_id%2=0 THEN NULL ELSE embedding END AS embedding,
        CASE WHEN vec_id%3=0 THEN NULL ELSE label END AS label FROM t""",
}

# queries whose inputs include a dirtied table (TPC-H tables stay clean,
# so their queries learn nothing from this lake)
_DIRTY_PREFIXES = (
    "evt_", "text_", "dedup_", "mm_", "mlprep_", "sim_", "embed_", "cdc_",
    "udf_", "udtf_", "split_", "sample_", "decontaminate_", "audit_",
    "profile_", "events_", "window_lag_lead", "window_forward_fill",
)


@pytest.fixture(scope="module")
def null_lake(tmp_path_factory):
    """events/documents/embeddings with ~half of every nullable non-key
    column NULLed (keys stay intact); other tables copied clean."""
    import duckdb

    from tests.conftest import SF_SMALL

    d = tmp_path_factory.mktemp("sf_nulls")
    con = duckdb.connect()
    for t in TABLES:
        sel = _NULL_SPECS.get(t, "SELECT * FROM t")
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
        con.execute(f"COPY ({sel}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


def test_queries_survive_null_heavy_tables(spark, null_lake):
    """Dirty data is the steady state at 100 TB: missing blobs, NULL
    timestamps, unlabeled rows. Every query over a dirtied table must
    degrade per SQL NULL semantics, never crash (this sweep caught
    fake_image_features calling len(None) on a NULL payload)."""
    from psql_streamer_spark.caching import INDEX_CACHE

    failures = []
    for name, fn in sorted(all_queries().items()):
        if not name.startswith(_DIRTY_PREFIXES):
            continue
        try:
            fn(spark, null_lake).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001 - collecting the sweep
            failures.append(f"{name}: {str(exc).splitlines()[0][:120]}")
    INDEX_CACHE.clear()
    assert not failures, "\n".join(failures)
