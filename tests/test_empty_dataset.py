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
