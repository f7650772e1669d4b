"""Central query/oracle registry.

Every operator module registers its driver-checkable queries here with
``@register(name, oracle=...)``. ``__spark_entry__.py`` exposes the maps to
the correctness harness. A query callable takes ``(spark, sf_dir)`` and
returns a DataFrame; the oracle is the DuckDB-SQL equivalent over the same
parquet tables (views pre-registered by the driver).

Determinism contract (hash-compared against DuckDB):
- alias every computed column identically in Spark and SQL;
- no uuid()/current_timestamp() in compared output — derive ids with md5;
- FP aggregates go through exact decimal sums (see functions/numeric.py)
  so both engines produce bit-identical doubles regardless of partial-agg
  ordering.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Declared ground-truth / sample-scale tiers: quadratic-by-definition
# verifiers (all-pairs mines, exact-substring ground truth, quality
# reports that EMBED a ground-truth mine). They are correct and
# oracle-checked at sample scale; corpus-scale sweeps exclude them BY
# DEFAULT (tools/scale_sweep.py reads this set when no explicit
# exclusion list is given), with the exclusion recorded in-artifact —
# declared once at the registration site instead of re-typed per sweep.
SAMPLE_SCALE: set[str] = set()

# Modules that register queries on import.
_OPERATOR_MODULES = (
    "psql_streamer_spark.operators.relational",
    "psql_streamer_spark.operators.windows",
    "psql_streamer_spark.operators.setops",
    "psql_streamer_spark.operators.scalar",
    "psql_streamer_spark.operators.cdc",
    "psql_streamer_spark.operators.event_time",
    "psql_streamer_spark.operators.dedup",
    "psql_streamer_spark.operators.similarity",
    "psql_streamer_spark.operators.text",
    "psql_streamer_spark.operators.multimodal",
    "psql_streamer_spark.operators.udfs",
    "psql_streamer_spark.operators.asof",
    "psql_streamer_spark.operators.relational_ext",
    "psql_streamer_spark.operators.tpch_suite",
    "psql_streamer_spark.operators.mlprep",
    "psql_streamer_spark.operators.profiling",
)


def register(
    name: str, oracle: str | None = None, sample_scale: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL).
    ``sample_scale=True`` declares a ground-truth tier that corpus-scale
    sweeps exclude by default (see SAMPLE_SCALE)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if sample_scale:
            SAMPLE_SCALE.add(name)
        return fn

    return deco


def sample_scale_queries() -> set[str]:
    load_all()
    return set(SAMPLE_SCALE)


def load_all() -> None:
    """Import every operator module so registrations run."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
