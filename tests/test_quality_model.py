"""Trained quality model (text_quality_model_scores): exact training
parity vs a pure-Python fixed-point reference, accuracy above the majority
baseline, and the broadcast scoring plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from psql_streamer_spark.operators.text import (
    FEATURE_HASH_DIMS,
    QM_DIMS,
    QM_FS,
    QM_ITERS,
    QM_LEN_CAP,
    QM_SCALE,
    QM_SHIFT_BASE,
    QM_SHIFT_DECAY,
    _qm_features,
    _qm_train,
    text_quality_model_scores,
)
from tests.conftest import SF_SMALL


def _reference_train(feats_rows):
    """The training loop in pure Python integers — the determinism spec
    both engines must land on."""
    feats: dict[int, list[tuple[int, int]]] = {}
    labels: dict[int, int] = {}
    for r in feats_rows:
        feats.setdefault(r.doc_id, []).append((r.dim, r.x))
        labels[r.doc_id] = r.y
    n = len(labels)
    npos = sum(labels.values())
    nneg = n - npos
    cwf_pos, cwf_neg = nneg / n, npos / n
    wsum = max(1, (2 * npos * nneg) // n)
    w = [0] * QM_DIMS
    for it in range(QM_ITERS):
        G = [0] * QM_DIMS
        for doc_id, fx in feats.items():
            y = labels[doc_id]
            zint = sum(w[d] * x for d, x in fx)
            z = zint / (QM_SCALE * QM_FS)
            p = 0.5 + (z / 2) / (1 + abs(z))
            cwf = cwf_pos if y == 1 else cwf_neg
            rq = math.floor(((p - y) * cwf) * QM_SCALE)
            for d, x in fx:
                G[d] += rq * x
        denom = (wsum << (QM_SHIFT_BASE + it // QM_SHIFT_DECAY)) * QM_FS
        for d in range(QM_DIMS):
            w[d] -= G[d] // denom
    return w


def test_training_matches_python_reference_exactly(spark):
    rows = _qm_features(spark, SF_SMALL).collect()
    want = _reference_train(rows)
    got, _ = _qm_train(spark, SF_SMALL)
    assert got == want  # integer weights: exact equality, no tolerance


def test_model_beats_majority_baseline(spark):
    df = text_quality_model_scores(spark, SF_SMALL)
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("correct").cast("int")).alias("ok"),
        F.sum(F.col("label")).alias("npos"),
        F.sum(F.when(F.col("label") == 1, F.col("correct").cast("int"))).alias("tp_ok"),
        F.sum(F.when(F.col("label") == 0, F.col("correct").cast("int"))).alias("tn_ok"),
        F.sum(F.lit(1) - F.col("label")).alias("nneg"),
    ).head()
    acc = agg.ok / agg.n
    baseline = max(agg.npos, agg.n - agg.npos) / agg.n
    assert acc > baseline, f"model acc {acc} <= majority {baseline}"
    # balanced accuracy: the model must actually catch negatives, not
    # just ride the class prior
    bal = (agg.tp_ok / agg.npos + agg.tn_ok / agg.nneg) / 2
    assert bal >= 0.75, f"balanced accuracy {bal}"


def test_features_are_bounded_integers(spark):
    f = _qm_features(spark, SF_SMALL)
    mx = f.agg(F.max("x").alias("mx"), F.min("x").alias("mn")).head()
    assert mx.mn >= 0
    assert mx.mx <= max(QM_FS, QM_LEN_CAP)
    dims = {r.dim for r in f.select("dim").distinct().collect()}
    assert max(dims) == FEATURE_HASH_DIMS + 1  # length + bias present
    # every doc carries the bias row (it is how stats count docs)
    n_docs = f.select("doc_id").distinct().count()
    n_bias = f.filter(F.col("dim") == FEATURE_HASH_DIMS + 1).count()
    assert n_bias == n_docs


def test_scoring_plan_broadcasts_the_model(spark):
    plan = (
        text_quality_model_scores(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_calibration_partitions_the_corpus(spark):
    from psql_streamer_spark.operators.text import (
        text_quality_model_calibration,
        text_quality_model_scores,
    )

    cal = text_quality_model_calibration(spark, SF_SMALL).collect()
    n_total = text_quality_model_scores(spark, SF_SMALL).count()
    assert sum(r.n_docs for r in cal) == n_total  # every doc in one bin
    for r in cal:
        assert 0 <= r.score_decile <= 9
        assert 0 <= r.n_positive <= r.n_docs
        assert r.min_score <= r.max_score
        # bin bounds actually live in the bin (decile 9 absorbs 1.0)
        lo, hi = r.score_decile / 10, (r.score_decile + 1) / 10
        assert lo <= r.min_score and (r.max_score < hi or r.score_decile == 9)


def test_null_text_scores_as_length_zero(spark):
    # a malformed ingest record (text=NULL) must featurize as length 0 —
    # the oracle's LEAST(COALESCE(nt,0),cap) — not a NULL margin
    from psql_streamer_spark.operators.text import _qm_features_from

    docs = spark.createDataFrame(
        [(1, None), (2, "twenty one words " * 7)], "doc_id long, text string"
    )
    f = {(r.doc_id, r.dim): r.x for r in _qm_features_from(docs).collect()}
    assert f[(1, FEATURE_HASH_DIMS)] == 0  # length feature, not NULL
    assert f[(1, FEATURE_HASH_DIMS + 1)] == QM_FS  # bias present
    assert f[(2, FEATURE_HASH_DIMS)] == 21


def test_quality_sampling_tracks_scores(spark):
    from psql_streamer_spark.operators.text import mlprep_sample_by_quality

    rows = mlprep_sample_by_quality(spark, SF_SMALL).collect()
    assert rows
    n = len(rows)
    kept = sum(r.sampled for r in rows)
    mean_score = sum(r.score for r in rows) / n
    # the deterministic coin realizes ~score keep probability: the
    # realized rate must sit near the mean score (binomial-ish bound)
    assert abs(kept / n - mean_score) < 0.05, (kept / n, mean_score)
    # determinism: a re-invocation keeps the identical set
    again = {
        r.doc_id: r.sampled
        for r in mlprep_sample_by_quality(spark, SF_SMALL).collect()
    }
    assert {r.doc_id: r.sampled for r in rows} == again
    # the exact rule, recomputed independently: kept iff the md5 coin
    # lands under floor(score * buckets). (A kept-vs-dropped mean-score
    # comparison is underpowered here: the rational sigmoid keeps scores
    # in a narrow band at this sf, which is exactly what the calibration
    # report exists to show.)
    import hashlib
    import math

    for r in rows:
        coin = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 1000
        assert r.sampled == (coin < math.floor(r.score * 1000)), r.doc_id
