"""A/B of the r17 index-level replica collapse (mm posting table stores
one row per unique vector + a members sidecar) vs the r16 member-level
posting layout, plus the vectorized _unique_rows kernel vs the r16 dict
pass.

Three layers, all honest A/Bs on identical data in one process:

1. kernel: _unique_rows (hash-sort-verify) vs _unique_rows_dict on
   (a) a 200k-replica hot bucket, (b) an all-unique 5k bucket,
   (c) an all-unique 200k bucket — the r16 collapse's 3% all-unique
   overhead lived here.

2. index + probe-memory: on a planted replica corpus, the collapsed
   posting table's row count and max per-skey group size (what one
   pandas screen worker must np.stack) vs the r16 member-level layout's
   — the O(k) -> O(u) per-worker bound of r15 verdict #1 / r16 verdict
   item 1. The member-level frame is reconstructed exactly (idx x
   members join), so "old" is the true r16 shape.

3. probe wall time: the delta screen + member expansion (the r17
   mm_incremental_candidates path) vs the r16 member-level screen over
   the reconstructed postings, same delta, asserted to emit the same
   candidate set.

Usage: python tools/mm_collapse_ab_r17.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psql_streamer_spark.operators.dedup import (  # noqa: E402
    _unique_rows,
    _unique_rows_dict,
    screen_unique_delta_pairs,
)

THR = 0.99 - 1e-6


def _time(fn, *args, reps=3):
    best, out = None, None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn(*args)
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def _grouping_sizes(inv):
    return sorted(np.bincount(inv).tolist(), reverse=True)


def kernel_scenarios() -> list[dict]:
    rng = np.random.default_rng(17)
    rows = []
    cases = []

    k = 200_000
    base = rng.integers(1, 40, size=64).astype(np.float64)
    extra = rng.integers(1, 40, size=(200, 64)).astype(np.float64)
    cases.append(
        ("hot_replica_bucket_200k", np.concatenate([np.tile(base, (k, 1)), extra]))
    )
    cases.append(
        ("all_unique_5k", rng.integers(1, 40, size=(5000, 64)).astype(np.float64))
    )
    cases.append(
        (
            "all_unique_200k",
            rng.integers(1, 400, size=(200_000, 64)).astype(np.float64),
        )
    )
    for name, m in cases:
        t_old, (uo, io) = _time(_unique_rows_dict, np.ascontiguousarray(m))
        t_new, (un, inn) = _time(_unique_rows, m)
        assert len(uo) == len(un)
        assert _grouping_sizes(io) == _grouping_sizes(inn)
        rows.append(
            {
                "scenario": name,
                "rows": int(len(m)),
                "unique": int(len(un)),
                "dict_sec": round(t_old, 4),
                "vectorized_sec": round(t_new, 4),
                "speedup": round(t_old / t_new, 1),
            }
        )
    return rows


def index_and_probe_ab() -> dict:
    """Planted replica corpus -> collapsed index vs reconstructed
    member-level postings: row counts, per-skey materialization bound,
    and delta-probe wall time (same candidate set asserted)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.dedup import (
        DELTA_BUCKETS,
    )
    from psql_streamer_spark.operators.mlprep import md5_bucket
    from psql_streamer_spark.operators.multimodal import (
        mm_bucket_index_table,
        screen_delta_group_posts,
    )
    from psql_streamer_spark.session import get_spark

    spark = get_spark("mm_collapse_ab_r17")
    # 60k docs: 10 replica clusters of 1k + 50k distinct payloads (the
    # r16 A/B corpus, so numbers are comparable across rounds)
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
    corpus_dir = "/tmp/mm_collapse_ab_r17_corpus"
    (
        d.unionByName(reps)
        .select(
            "doc_id",
            "text",
            F.lit("xx").alias("lang"),
            F.lit("ab").alias("source"),
            F.length("text").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/documents.parquet")
    )

    table = mm_bucket_index_table(spark, corpus_dir)
    idx = spark.table(table).persist()
    members = spark.table(f"{table}__members").persist()
    n_postings_new = idx.count()
    n_members = members.count()
    # the r16 layout stored one posting per MEMBER: reconstruct it
    old_posts = (
        idx.join(members, "gid")
        .select("skey", "doc_id", "e")
        .persist()
    )
    n_postings_old = old_posts.count()

    def _max_group(df) -> int:
        return (
            df.groupBy("skey")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n"))
            .head()[0]
        )

    max_group_new = _max_group(idx)
    max_group_old = _max_group(old_posts)

    # delta probe A/B: same md5 delta bucket, old member-level screen vs
    # new group screen + member expansion
    bucket = 0
    is_new_doc = md5_bucket(F.col("doc_id"), DELTA_BUCKETS) == bucket

    def run_new() -> tuple[float, set]:
        t0 = time.monotonic()
        new_members = members.filter(is_new_doc)
        new_gids = new_members.select("gid").distinct()
        posts = idx.join(
            F.broadcast(new_gids.withColumn("is_new", F.lit(True))),
            "gid",
            "left",
        ).select(
            "skey",
            "gid",
            "e",
            F.coalesce("is_new", F.lit(False)).alias("is_new"),
        )
        gp = screen_delta_group_posts(posts)
        cand = (
            gp.join(
                new_members.select(
                    F.col("gid").alias("g_new"), F.col("doc_id").alias("x")
                ),
                "g_new",
            )
            .join(
                members.select(
                    F.col("gid").alias("g_other"), F.col("doc_id").alias("y")
                ),
                "g_other",
            )
            .filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("doc_a"),
                F.greatest("x", "y").alias("doc_b"),
            )
            .distinct()
        )
        got = {(r.doc_a, r.doc_b) for r in cand.collect()}
        return time.monotonic() - t0, got

    def run_old() -> tuple[float, set]:
        t0 = time.monotonic()
        posts = old_posts.select(
            "skey", "doc_id", "e", is_new_doc.alias("is_new")
        )

        def _delta_screen(pdf: pd.DataFrame) -> pd.DataFrame:
            new_mask = pdf["is_new"].to_numpy()
            if len(pdf) < 2 or not new_mask.any():
                return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(
                    "int64"
                )
            m = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            ids = pdf["doc_id"].to_numpy()
            lo, hi = screen_unique_delta_pairs(m, ids, new_mask, THR)
            return pd.DataFrame({"doc_a": lo, "doc_b": hi}).drop_duplicates()

        cand = (
            posts.groupBy("skey")
            .applyInPandas(_delta_screen, schema="doc_a long, doc_b long")
            .distinct()
        )
        got = {(r.doc_a, r.doc_b) for r in cand.collect()}
        return time.monotonic() - t0, got

    # warm once each, then best-of-2
    _, got_new = run_new()
    _, got_old = run_old()
    assert got_new == got_old, (
        len(got_new), len(got_old), list(got_new ^ got_old)[:5]
    )
    t_new = min(run_new()[0], run_new()[0])
    t_old = min(run_old()[0], run_old()[0])

    out = {
        "corpus_docs": n_uniq + n_clusters * cluster_k,
        "replica_clusters": n_clusters,
        "cluster_size": cluster_k,
        "index_rows_old_member_level": n_postings_old,
        "index_rows_new_collapsed": n_postings_new,
        "index_row_ratio": round(n_postings_old / n_postings_new, 2),
        "members_sidecar_rows": n_members,
        "max_skey_group_rows_old": max_group_old,
        "max_skey_group_rows_new": max_group_new,
        "max_group_stack_mib_old": round(max_group_old * 64 * 8 / 2**20, 2),
        "max_group_stack_mib_new": round(max_group_new * 64 * 8 / 2**20, 2),
        "delta_candidates": len(got_new),
        "probe_old_sec": round(t_old, 3),
        "probe_new_sec": round(t_new, 3),
        "probe_speedup": round(t_old / t_new, 2),
    }
    old_posts.unpersist()
    members.unpersist()
    idx.unpersist()
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MM_COLLAPSE_AB_r17.json"
    res = {
        "unique_rows_kernel": kernel_scenarios(),
        "index_and_probe": index_and_probe_ab(),
    }
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
