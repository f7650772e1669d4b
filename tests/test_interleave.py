"""mlprep_interleave_sources: planted-frame exact-order pin, the stride
property, and the plan contract (no global sort, no Python in the path).

The registered query is hash-checked against the DuckDB oracle at both
slice SFs; these tests pin the SEMANTICS the oracle cannot see — that the
two-phase bucketed ranking equals a brute-force total order computed
independently in Python, and that the schedule actually interleaves at
the weight ratio (the synthetic corpus' near-equal sources exercise only
a degenerate ~1:1 mix).
"""

from __future__ import annotations

import hashlib
import math

import pytest

from psql_streamer_spark.operators.mlprep import (
    INTERLEAVE_SUB_STREAMS,
    INTERLEAVE_VT_SCALE,
    interleave_sources_frame,
)

SF_DIR = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _reference_order(rows):
    """Brute-force replica of the op's integer math: (doc_id, source,
    src_rank, weight_units, vt, position) for a list of
    (doc_id, source, text) rows."""
    tokens = {}
    for doc_id, source, text in rows:
        nw = len([w for w in text.lower().split(" ") if w])
        tokens[source] = tokens.get(source, 0) + nw
    weight = {
        s: max(1, int(math.floor(math.sqrt(n)))) for s, n in tokens.items()
    }
    per_source = {}
    for doc_id, source, _ in rows:
        h = _md5(str(doc_id))
        sub = int(h[:8], 16) % INTERLEAVE_SUB_STREAMS
        per_source.setdefault(source, []).append((sub, h, doc_id))
    out = []
    for source, docs in per_source.items():
        for r, (_, _, doc_id) in enumerate(sorted(docs), start=1):
            vt = (r * INTERLEAVE_VT_SCALE) // weight[source]
            out.append((vt, source, doc_id, r, weight[source]))
    out.sort()
    return {
        doc_id: (source, r, w, vt, pos)
        for pos, (vt, source, doc_id, r, w) in enumerate(out)
    }


def _planted_frame(spark):
    # Source a: 60 docs x 16 tokens (w=30); source b: 25 docs x 4 tokens
    # (w=10); source c: 3 docs x 1 token (w=1) — a tiny straggler source
    # whose huge stride puts it at the order's tail.
    rows = []
    for i in range(60):
        rows.append((1000 + i, "a", " ".join(f"t{j}" for j in range(16))))
    for i in range(25):
        rows.append((2000 + i, "b", "u0 u1 u2 u3"))
    for i in range(3):
        rows.append((3000 + i, "c", "v0"))
    return rows, spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_interleave_matches_bruteforce_reference(spark):
    rows, d = _planted_frame(spark)
    ref = _reference_order(rows)
    got = {
        r.doc_id: (r.source, r.src_rank, r.weight_units, r.vt, r.position)
        for r in interleave_sources_frame(d).collect()
    }
    assert got == ref


def test_interleave_stride_property(spark):
    """In every prefix of the order (while no source is exhausted), each
    source's share tracks weight/total within one stride: source a
    (weight 30) must appear ~3x as often as source b (weight 10)."""
    _, d = _planted_frame(spark)
    order = [
        r.source
        for r in interleave_sources_frame(d).orderBy("position").collect()
    ]
    # b's 25 docs at stride S/10 cover the same vt horizon as a's first
    # 75 — a is exhausted (60 docs) first; check prefixes while both run.
    for p in range(8, 60):
        prefix = order[:p]
        na, nb = prefix.count("a"), prefix.count("b")
        expect_a = p * 30 / 41  # weights 30 + 10 + 1
        assert abs(na - expect_a) <= 3, (p, na, expect_a)
        assert nb >= 1
    # no source-contiguous block longer than a couple of strides
    max_run = run = 1
    for x, y in zip(order, order[1:]):
        run = run + 1 if x == y else 1
        max_run = max(max_run, run)
    assert max_run <= 8
    # the straggler source lands at the tail, after both big sources
    # have made progress
    first_c = order.index("c")
    assert order[:first_c].count("a") >= 20
    assert order[:first_c].count("b") >= 5


def test_interleave_plan_has_no_global_sort_and_no_python(spark, queries):
    plan = queries["mlprep_interleave_sources"](spark, SF_DIR)._jdf \
        .queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()  # never a global sort
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    # the per-source rank window is salted: partitioned on (source, sub)
    assert "hashpartitioning(source" in plan
    # the global position comes from the bucket window, not ORDER BY
    assert "hashpartitioning(bucket" in plan
    # r16: the bucket-offset prefix-sum is two-level — the per-bucket
    # count frame flows through a window PARTITIONED by coarse group
    # (parallel); only the ~N/16.7M-row coarse-total frame may use a
    # partition-less window
    assert "hashpartitioning(coarse" in plan


@pytest.fixture(scope="module")
def queries():
    from psql_streamer_spark.registry import all_queries

    return all_queries()
