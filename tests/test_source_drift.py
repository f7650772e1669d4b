"""profile_source_token_drift: full brute-force reference replica on a
planted frame (exercising the OOV bucket and the disjoint-source
extreme), plus the plan contract. The registered query is hash-checked
against the DuckDB oracle at both slice SFs; this pins the SEMANTICS on
distributions the synthetic corpus cannot produce.
"""

from __future__ import annotations

from collections import Counter

import pytest

from psql_streamer_spark.operators.profiling import (
    SOURCE_DRIFT_OOV,
    SOURCE_DRIFT_TOP_K,
    source_token_drift_frame,
)

SF_DIR = "/root/testdata/sf0.001"


def _reference(rows):
    """Integer-exact replica of the op: rows = (doc_id, source, text)."""
    per = Counter()
    for _, source, text in rows:
        for w in text.lower().split(" "):
            if w:
                per[(w, source)] += 1
    corpus = Counter()
    srcs = Counter()
    for (t, s), n in per.items():
        corpus[t] += n
        srcs[s] += n
    T = sum(corpus.values())
    ref = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
        :SOURCE_DRIFT_TOP_K
    ]
    cref = sum(c for _, c in ref)
    out = {}
    for s, S in srcs.items():
        devs = []
        matched = 0
        for t, c in ref:
            d = per.get((t, s), 0)
            matched += d
            devs.append((t, abs(c * S - d * T)))
        oov_tokens = S - matched
        devs.append(
            (SOURCE_DRIFT_OOV, abs((T - cref) * S - oov_tokens * T))
        )
        tv_num = sum(v for _, v in devs)
        top_token, top_dev = sorted(
            devs, key=lambda kv: (-kv[1], kv[0])
        )[0]
        tv = round(tv_num * 1.0 / (2.0 * T * S), 8) if S else None
        out[s] = (S, oov_tokens, tv_num, tv, top_token, top_dev)
    return out


def _planted_rows():
    rows = []
    # "base": 70 docs over a small head vocabulary (the corpus mix)
    for i in range(70):
        rows.append((i, "base", "alpha beta gamma delta alpha beta"))
    # "tail": rare filler vocabulary wider than TOP_K, so real OOV mass
    for i in range(80):
        rows.append((100 + i, "tail", f"alpha filler{i:03d} beta"))
    # "broken": disjoint vocabulary — the broken-extractor outlier
    for i in range(10):
        rows.append((300 + i, "broken", "qqq1 qqq2 qqq3 qqq4"))
    return rows


def test_source_drift_matches_bruteforce_reference(spark):
    rows = _planted_rows()
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: (
            r.n_tokens,
            r.oov_tokens,
            r.tv_num,
            r.tv_drift,
            r.top_token,
            r.top_token_dev,
        )
        for r in source_token_drift_frame(d).collect()
    }
    assert got == _reference(rows)
    # the planted frame actually exercises what it claims to
    assert got["tail"][1] > 0  # OOV bucket carries mass
    assert got["broken"][3] > got["base"][3]  # outlier ranks first
    assert got["broken"][3] > 0.8  # disjoint vocab ~ (T-S)/T


def test_source_drift_plan_is_one_token_shuffle_no_python(spark, queries):
    plan = (
        queries["profile_source_token_drift"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    # the corpus-sized aggregate shuffles on (token, source); the rest is
    # broadcast grid assembly over K/|sources|-bounded frames
    assert "hashpartitioning(token" in plan


@pytest.fixture(scope="module")
def queries():
    from psql_streamer_spark.registry import all_queries

    return all_queries()


def test_embedding_drift_flags_planted_mean_shift(spark):
    """profile_embedding_drift's semantics on a planted frame (the
    synthetic embeddings are drawn from one distribution, so the real
    tables never produce a shifted delta): a delta whose dimension 7 is
    shifted +0.5 must name dim 7 as top_dim, and every reported number
    must equal the integer-exact Python replica."""
    import math

    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.profiling import (
        EMBED_DRIFT_GRID,
        embedding_drift_frame,
    )

    dims = 8
    prior = [
        (i, [0.01 * ((i + d) % 5) for d in range(dims)]) for i in range(20)
    ]
    delta = [
        (
            100 + i,
            [
                0.01 * ((i + d) % 5) + (0.5 if d == 7 else 0.0)
                for d in range(dims)
            ],
        )
        for i in range(5)
    ]
    rows = prior + delta
    v = spark.createDataFrame(rows, "vec_id long, e array<double>")
    got = embedding_drift_frame(v, F.col("vec_id") >= 100).collect()[0]

    # integer-exact replica
    def qsum(vecs, d):
        return sum(int(math.floor(e[d] * EMBED_DRIFT_GRID)) for _, e in vecs)

    n_d, n_p = len(delta), len(prior)
    devs = [
        abs(qsum(delta, d) * n_p - qsum(prior, d) * n_d)
        for d in range(dims)
    ]
    l1 = sum(devs)
    top_dim = max(range(dims), key=lambda d: (devs[d], -d))
    assert (
        got.n_delta,
        got.n_prior,
        got.n_dims,
        got.l1_dev,
        got.top_dim,
        got.top_dim_dev,
    ) == (n_d, n_p, dims, l1, top_dim, devs[top_dim])
    assert got.top_dim == 7
    assert got.mean_shift_q == round(l1 * 1.0 / (dims * 1.0 * n_d * n_p), 6)
    # an unshifted delta from the same distribution reads ~0
    null_shift = embedding_drift_frame(
        spark.createDataFrame(prior, "vec_id long, e array<double>"),
        F.col("vec_id") % 4 == 0,
    ).collect()[0]
    assert null_shift.mean_shift_q < got.mean_shift_q / 10


def test_mad_outliers_catch_what_three_sigma_masks(spark):
    """The masking case: a group whose contamination inflates its own
    mean AND std until the 3-sigma gate flags nothing, while median/MAD
    (50% breakdown) flags exactly the planted junk."""
    import statistics

    from psql_streamer_spark.operators.profiling import (
        MAD_OUTLIER_K,
        value_outliers_mad_frame,
    )

    good = [10.0 + 0.1 * i for i in range(40)]
    junk = [1e6] * 8
    vals = good + junk
    e = spark.createDataFrame(
        [("burst", v) for v in vals], "event_type string, value double"
    )
    row = value_outliers_mad_frame(e).collect()[0]
    med = statistics.median_low(sorted(vals))
    assert row.median_value == med
    assert row.n_outliers == len(junk)  # MAD flags exactly the junk
    # the same data defeats the 3-sigma gate: threshold above the junk
    mean = statistics.fmean(vals)
    std = statistics.stdev(vals)
    assert mean + 3 * std > 1e6, "planted masking scenario must mask"
    assert all(abs(v - mean) <= 3 * std for v in vals)
    # and MAD's threshold sits far below the junk
    assert MAD_OUTLIER_K * row.mad < 1e5


def test_zipf_deviation_separates_organic_from_uniform(spark):
    """The two extremes: a planted Zipf-distributed corpus reads ratios
    ~1 at every rank; a planted uniform corpus reads ratio == r at rank
    r (exactly, by the integer cross-multiplication)."""
    from psql_streamer_spark.operators.text import (
        ZIPF_TOP_K,
        zipf_deviation_frame,
    )

    zipf_words = []
    for r in range(1, 31):
        zipf_words += [f"tok{r:02d}"] * (1000 // r)
    zipfy = spark.createDataFrame(
        [(" ".join(zipf_words),)], "text string"
    )
    rows = {r.rank: r for r in zipf_deviation_frame(zipfy).collect()}
    assert len(rows) == ZIPF_TOP_K
    assert all(0.9 <= rows[r].zipf_ratio <= 1.05 for r in rows)

    utext = " ".join(
        f"u{i:02d}" for _ in range(50) for i in range(30)
    )
    uniform = spark.createDataFrame([(utext,)], "text string")
    urows = {r.rank: r for r in zipf_deviation_frame(uniform).collect()}
    assert all(urows[r].zipf_ratio == float(r) for r in urows)
