"""A/B of the r16 unique-vector-collapse screens vs the r15 uncollapsed
screens on planted replica-heavy buckets (r15 verdict #1: byte-identical
payloads share every hyperplane bucket, so the bucket-local matmul was
O(bucket^2) / O(delta x bucket) in the REPLICA count).

Two layers, both honest A/Bs running old and new logic on identical data
in one process:

1. numpy-level: the screen kernels alone, on planted buckets —
   (a) one hot bucket of pure replicas probed by a non-matching delta
       (the 100 TB boilerplate-logo case: output is EMPTY, so the timing
       is pure screen compute, not pair emission);
   (b) mixed replica clusters, full-screen;
   (c) an all-unique bucket (regression check: the collapse pays an
       np.unique sort when there is nothing to collapse).

2. Spark-level: the screen STAGE of mm_dedup_embedding (sig frame ->
   applyInPandas -> distinct -> count) on a planted corpus with replica
   clusters, old vs new screen body over the same persisted sig frame.

Usage: python tools/mm_screen_ab_r16.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psql_streamer_spark.operators.dedup import (
    screen_unique_delta_pairs,
    screen_unique_pairs,
)

THR = 0.99 - 1e-6


def old_full_screen(m, ids, thr):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ai, bi = np.nonzero(np.triu(mn @ mn.T >= thr, k=1))
    da, db = ids[ai], ids[bi]
    return np.minimum(da, db), np.maximum(da, db)


def old_delta_screen(m, ids, new_mask, thr):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ni = np.nonzero(new_mask)[0]
    sims = mn[ni] @ mn.T
    ai, bi = np.nonzero(sims >= thr)
    da, db = ids[ni[ai]], ids[bi]
    keep = da != db
    da, db = da[keep], db[keep]
    return np.minimum(da, db), np.maximum(da, db)


def _time(fn, *args, reps=3):
    best = None
    out = None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn(*args)
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def numpy_scenarios() -> list[dict]:
    rng = np.random.default_rng(16)
    rows = []

    # (a) hot replica bucket, non-matching delta probe: 200k replicas of
    # one vector + 200 unrelated delta rows. Output empty by design.
    k = 200_000
    base = rng.integers(1, 40, size=64).astype(np.float64)
    delta = rng.integers(1, 40, size=(200, 64)).astype(np.float64)
    # orthogonal-ish noise so no delta row matches the replica vector
    delta[:, :32] = 0.0
    m = np.concatenate([np.tile(base, (k, 1)), delta])
    ids = np.arange(len(m), dtype=np.int64)
    new_mask = np.zeros(len(m), dtype=bool)
    new_mask[k:] = True
    t_old, (oa, _) = _time(old_delta_screen, m, ids, new_mask, THR)
    t_new, (na, _) = _time(screen_unique_delta_pairs, m, ids, new_mask, THR)
    assert len(oa) == len(na) == 0
    rows.append(
        {
            "scenario": "delta_probe_hot_replica_bucket",
            "bucket_rows": int(len(m)),
            "unique_rows": 201,
            "pairs": 0,
            "old_sec": round(t_old, 4),
            "new_sec": round(t_new, 4),
            "speedup": round(t_old / t_new, 1),
        }
    )

    # (b) full screen, mixed replica clusters: 20 clusters x 2000 replicas
    # + 2000 unique rows. Pairs are cluster-internal (output-bound in both
    # paths); the screen compute is what differs.
    clusters = [
        np.tile(rng.integers(1, 40, size=64).astype(np.float64), (2000, 1))
        for _ in range(20)
    ]
    uniq = rng.integers(1, 40, size=(2000, 64)).astype(np.float64)
    m = np.concatenate(clusters + [uniq])
    ids = np.arange(len(m), dtype=np.int64)
    t_old, (oa, ob) = _time(old_full_screen, m, ids, THR, reps=1)
    t_new, (na, nb) = _time(screen_unique_pairs, m, ids, THR, reps=1)
    assert set(zip(oa, ob)) == set(zip(na, nb))
    rows.append(
        {
            "scenario": "full_screen_replica_clusters",
            "bucket_rows": int(len(m)),
            "unique_rows": 2020,
            "pairs": int(len(na)),
            "old_sec": round(t_old, 4),
            "new_sec": round(t_new, 4),
            "speedup": round(t_old / t_new, 1),
        }
    )

    # (c) regression check: all-unique bucket (normal occupancy x20) —
    # what the collapse COSTS when there is nothing to collapse.
    m = rng.integers(1, 40, size=(5000, 64)).astype(np.float64)
    ids = np.arange(len(m), dtype=np.int64)
    t_old, (oa, ob) = _time(old_full_screen, m, ids, THR)
    t_new, (na, nb) = _time(screen_unique_pairs, m, ids, THR)
    assert set(zip(oa, ob)) == set(zip(na, nb))
    rows.append(
        {
            "scenario": "all_unique_bucket_overhead",
            "bucket_rows": 5000,
            "unique_rows": 5000,
            "pairs": int(len(na)),
            "old_sec": round(t_old, 4),
            "new_sec": round(t_new, 4),
            "speedup": round(t_old / t_new, 2),
        }
    )
    return rows


def spark_screen_stage_ab() -> dict:
    """Screen stage of mm_dedup_embedding on a planted replica corpus:
    identical persisted sig frame, old vs new screen body."""
    import pandas as pd
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.multimodal import (
        _mm_hist_from,
        _mm_model_of,
        _mm_planes,
        _mm_signed_postings,
    )
    from psql_streamer_spark.session import get_spark

    spark = get_spark("mm_screen_ab_r16")
    # 60k docs: 10 replica clusters of 1k + 50k distinct payloads
    n_uniq, n_clusters, cluster_k = 50_000, 10, 1000
    d = spark.range(n_uniq).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("payload body "),
            F.md5(F.col("id").cast("string")),
            F.lit(" "),
            F.md5((F.col("id") * 7).cast("string")),
        ).alias("text"),
    )
    reps = spark.range(n_clusters * cluster_k).select(
        (F.col("id") + n_uniq).alias("doc_id"),
        F.concat(
            F.lit("boilerplate logo replica #"),
            (F.col("id") % n_clusters).cast("string"),
        ).alias("text"),
    )
    media = (
        d.unionByName(reps)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
        .repartition(32)
    )
    hist = _mm_hist_from(media).persist()
    n_docs, S = _mm_model_of(hist)
    sig = _mm_signed_postings(hist, n_docs, S, _mm_planes(n_docs)).persist()
    sig.count()

    screen_thr = THR

    def new_screen(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        m = np.stack(pdf["e"].to_numpy()).astype(np.float64)
        ids = pdf["doc_id"].to_numpy()
        lo, hi = screen_unique_pairs(m, ids, screen_thr)
        return pd.DataFrame({"doc_a": lo, "doc_b": hi})

    def old_screen(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        m = np.stack(pdf["e"].to_numpy()).astype(np.float64)
        ids = pdf["doc_id"].to_numpy()
        lo, hi = old_full_screen(m, ids, screen_thr)
        return pd.DataFrame({"doc_a": lo, "doc_b": hi})

    def run(fn) -> tuple[float, int]:
        t0 = time.monotonic()
        n = (
            sig.groupBy("tbl", "bucket")
            .applyInPandas(fn, schema="doc_a long, doc_b long")
            .distinct()
            .count()
        )
        return time.monotonic() - t0, n

    # warm both once, then best-of-2 each
    run(new_screen)
    t_new = min(run(new_screen)[0], run(new_screen)[0])
    t_old, n_old = run(old_screen)
    t_old = min(t_old, run(old_screen)[0])
    _, n_new = run(new_screen)
    assert n_old == n_new, (n_old, n_new)
    out = {
        "corpus_docs": n_docs,
        "replica_clusters": n_clusters,
        "cluster_size": cluster_k,
        "planes": _mm_planes(n_docs),
        "distinct_pairs": n_new,
        "old_sec": round(t_old, 3),
        "new_sec": round(t_new, 3),
        "speedup": round(t_old / t_new, 2),
    }
    sig.unpersist()
    hist.unpersist()
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MM_SCREEN_AB_r16.json"
    res = {"numpy": numpy_scenarios(), "spark_screen_stage": spark_screen_stage_ab()}
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
