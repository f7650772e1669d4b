"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This is the same check the driver runs at sf0.01 — running it in-tree keeps
regressions visible per-commit. Queries without an oracle get a rows-only
smoke check (must execute and return a well-formed schema).
"""

from __future__ import annotations

import pytest

from psql_streamer_spark.registry import all_oracles, all_queries
from tests.conftest import SF_SMALL
from tools.oracle_check import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL)
    if name not in ORACLES:
        assert sdf.count() >= 0
        assert len(sdf.columns) > 0
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
