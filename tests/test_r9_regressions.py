"""Round-9 regression pins for the r8 ADVICE findings.

1. salted_join's documented driver-memory bound (<= |big|/hot_row_threshold
   collected hot keys) silently broke when hot_row_threshold *
   sample_fraction < 1: frac_floor floored at 1, so EVERY key appearing
   once in the sample was flagged hot and the collect could reach
   ~sample_fraction * |big| keys. The parameter combination is now
   rejected, and a Spark-side max_hot_keys TakeOrdered caps the collect
   unconditionally (dropping a key from the hot set is correctness-
   neutral by construction — salting only moves which reducer a pair
   meets on).
2. scale_sweep noop mode ran each query twice (noop write + separate
   count) but folded only the write into per-query sec while the total
   included both, so scale_sweep_total_sec stopped being comparable to
   the per-query sum or to count-mode artifacts; and a count() failure
   after a successful noop write discarded the measured time. The count
   is now timed separately (rows_sec), excluded from sec and from the
   total (which is now the per-query sum; wall_sec keeps the wall), and
   a count failure preserves the noop timing (rows=None, rows_err).
3. SPARK_GRAFT_SWEEP_EXCLUDE silently overrode queries explicitly named
   on the command line. Explicit CLI args now win, with a warning.
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stderr, redirect_stdout

import pytest

SF_SMALL = "/root/testdata/sf0.001"


def test_salted_join_rejects_unresolvable_sample_floor(spark):
    """hot_row_threshold * sample_fraction < 1 means the sampled floor
    degenerates to 1 (every sampled key "hot") — must be rejected up
    front, not silently blow the documented driver-collect bound."""
    from psql_streamer_spark.operators.asof import salted_join

    big = spark.range(100).selectExpr("id AS k", "id AS payload")
    small = spark.range(10).selectExpr("id AS sk", "id AS attr")
    with pytest.raises(ValueError, match="sample"):
        salted_join(
            big, small, big_on="k", small_on="sk",
            hot_row_threshold=10, sample_fraction=0.01,  # product 0.1 < 1
        )


def test_salted_join_max_hot_keys_cap_is_correctness_neutral(spark):
    """Two genuinely hot keys but max_hot_keys=1: the collect keeps only
    the hottest key, and the join stays row-identical to the plain join
    (a dropped hot key just doesn't get salted)."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.asof import salted_join

    hot_a = spark.range(8_000).select(F.lit(3).alias("k"), F.col("id").alias("payload"))
    hot_b = spark.range(4_000).select(F.lit(5).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(1_000).select(
        (F.col("id") % 100 + 100).alias("k"), F.col("id").alias("payload")
    )
    big = hot_a.unionByName(hot_b).unionByName(cold)
    small = spark.range(300).selectExpr("id AS sk", "id * 10 AS attr")

    out = salted_join(
        big, small, big_on="k", small_on="sk",
        buckets=4, salt_by="payload",
        hot_row_threshold=100, sample_fraction=0.05,
        max_hot_keys=1,
    )
    plain = big.join(small, F.col("k") == F.col("sk"))
    assert out.count() == plain.count()
    got = {r.k: r.n for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()}
    exp = {r.k: r.n for r in plain.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert got == exp


def _run_sweep_main(argv, env, capsys_out):
    """Run tools.scale_sweep.main() in-process (shares the test Spark
    session via get_spark's getOrCreate) with patched argv/env."""
    import importlib

    sweep = importlib.import_module("tools.scale_sweep")
    old_argv, old_env = sys.argv, {}
    for k, v in env.items():
        old_env[k] = os.environ.get(k)
        os.environ[k] = v
    sys.argv = argv
    try:
        with redirect_stdout(capsys_out["out"]), redirect_stderr(capsys_out["err"]):
            sweep.main()
    finally:
        sys.argv = old_argv
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_sweep_cli_overrides_exclusion_and_noop_totals(spark, tmp_path):
    """One in-process sweep run pins both r8 sweep findings: a query
    named on the CLI runs even when SPARK_GRAFT_SWEEP_EXCLUDE lists it
    (with a warning), and in noop mode the per-query record carries
    rows_sec while scale_sweep_total_sec equals the per-query sum."""
    out_path = tmp_path / "sweep.json"
    bufs = {"out": io.StringIO(), "err": io.StringIO()}
    _run_sweep_main(
        ["scale_sweep.py", SF_SMALL, "scalar_string_functions"],
        {
            "SPARK_GRAFT_SWEEP_EXCLUDE": "scalar_string_functions",
            "SPARK_GRAFT_SWEEP_EVAL": "noop",
            "SPARK_GRAFT_SWEEP_OUT": str(out_path),
        },
        bufs,
    )
    assert "requested explicitly" in bufs["err"].getvalue()
    summary = json.loads(out_path.read_text())
    assert summary["eval_mode"] == "noop"
    # the explicitly-requested query ran despite the exclusion
    assert "scalar_string_functions" in summary["queries"]
    assert summary["excluded"] == []  # nothing implicitly skipped
    rec = summary["queries"]["scalar_string_functions"]
    assert rec["rows"] is not None and rec["rows"] >= 0
    assert "rows_sec" in rec  # count timed separately
    # total is the per-query sum (rows_sec excluded), wall carries all
    per_query_sum = round(sum(q["sec"] for q in summary["queries"].values()), 3)
    assert abs(summary["value"] - per_query_sum) < 0.05
    assert summary["wall_sec"] >= summary["value"]
