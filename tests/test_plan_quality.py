"""Physical-plan shape assertions — the 100 TB discipline, enforced.

These tests pin the properties that matter at scale and would silently
regress otherwise: filters pushed into the parquet scan, projections
pruned to the read columns, fixed-size dims broadcast, top-k executed as
TakeOrdered (no global sort), the CDC hot path free of Python evaluation,
and routing free of shuffles."""

from __future__ import annotations

import pytest

from psql_streamer_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark, queries):
    plan = _physical(queries["q1_pricing_summary"](spark, SF_DIR))
    # the shipdate predicate must reach the parquet scan...
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ...and the scan must read only the 7 needed columns, not all 11
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q5_broadcasts_dims_and_semi_reduces(spark, queries):
    plan = _physical(queries["q5_local_supplier_volume"](spark, SF_DIR))
    # nation/region reduction joins are broadcast, never shuffled
    assert "BroadcastHashJoin" in plan
    # the region filter reaches the region scan (pushed into parquet)
    assert "EqualTo(r_name,ASIA)" in plan


def test_broadcast_enrich_has_no_shuffle_join(spark, queries):
    plan = _physical(queries["join_broadcast_enrich"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered_not_global_sort(spark, queries):
    plan = _physical(queries["topk_customers_by_revenue"](spark, SF_DIR))
    # LIMIT k over ORDER BY must compile to TakeOrderedAndProject: each
    # partition keeps k rows, the driver merges — no full sort shuffle
    assert "TakeOrderedAndProject" in plan


def test_cdc_hot_path_is_jvm_only(spark, queries):
    # decode -> envelope -> route -> key -> serialize must stay inside
    # codegen: any BatchEvalPython/ArrowEvalPython here would put Python
    # in the per-event path the reference runs in native code
    for name in ("cdc_envelope_dml_events", "cdc_route_with_fallback",
                 "cdc_serialize_passthrough", "cdc_default_message_keys"):
        plan = _physical(queries[name](spark, SF_DIR))
        assert "EvalPython" not in plan, name
        # "*(n)" marks WholeStageCodegen in plan.toString(); AQE plans
        # print pre-codegen, so accept either
        assert "*(1)" in plan or "AdaptiveSparkPlan" in plan, name


def test_routing_is_shuffle_free(spark):
    from psql_streamer_spark.routing import route
    from psql_streamer_spark.operators.cdc import _as_cdc_events

    routed = route(
        _as_cdc_events(spark, SF_DIR), {"tbl_signup": "t1"}, fallback="fb"
    )
    plan = _physical(routed)
    assert "Exchange" not in plan  # pure projection: no shuffle anywhere


def test_semi_and_anti_joins_stay_semi(spark, queries):
    # left-semi/anti must not degrade into inner-join + distinct
    plan_semi = _physical(queries["join_semi_customers_with_orders"](spark, SF_DIR))
    plan_anti = _physical(queries["join_anti_customers_without_orders"](spark, SF_DIR))
    assert "LeftSemi" in plan_semi
    assert "LeftAnti" in plan_anti


def test_exact_dedup_is_partial_aggregated(spark, queries):
    # dropDuplicates compiles to hash aggregate with a partial (map-side)
    # phase — the dedup shuffles only one row per key, not the raw data
    plan = _physical(queries["dedup_exact_text"](spark, SF_DIR))
    assert "HashAggregate" in plan
