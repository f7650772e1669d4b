"""Measured recall/precision of mm_dedup_embedding vs blocked-numpy brute
force on the same byte-bigram histograms, at sf0.1 and .scale/sf1 — the
quality measurement every LSH tier in this repo ships with.

Usage: python tools/mm_recall_r13.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession


def brute_pairs(spark, sf_dir: str, thr: float) -> set[tuple[int, int]]:
    from psql_streamer_spark.operators.multimodal import (
        MM_HIST_DIM,
        _mm_hist_frame,
    )

    rows = _mm_hist_frame(spark, sf_dir).collect()
    ids = np.array([r.doc_id for r in rows])
    m = np.array([r.h for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out: set[tuple[int, int]] = set()
    B = 2048
    for i0 in range(0, len(ids), B):
        a = m[i0 : i0 + B]
        sims = a @ m.T
        ai, bi = np.nonzero(sims >= thr)
        for x, y in zip(ai + i0, bi):
            if x < y:
                p = (int(ids[x]), int(ids[y]))
                out.add((min(p), max(p)))
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MM_RECALL_r13.json"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from psql_streamer_spark.operators.multimodal import (
        MM_COSINE_DUP,
        mm_dedup_embedding,
    )

    results = []
    for label, d in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", "/root/repo/.scale/sf1"),
    ):
        if not os.path.isdir(d):
            continue
        t0 = time.monotonic()
        got = {
            (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
            for r in mm_dedup_embedding(spark, d).collect()
        }
        lsh_sec = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        truth = brute_pairs(spark, d, MM_COSINE_DUP)
        brute_sec = round(time.monotonic() - t0, 2)
        fp = len(got - truth)
        recall = len(got & truth) / len(truth) if truth else 1.0
        results.append(
            {
                "sf": label,
                "threshold": MM_COSINE_DUP,
                "truth_pairs": len(truth),
                "found_pairs": len(got),
                "recall": round(recall, 4),
                "false_positives": fp,
                "lsh_sec": lsh_sec,
                "brute_sec": brute_sec,
            }
        )
        print(results[-1], flush=True)
    with open(out_path, "w") as f:
        json.dump({"rows": results, "note": __doc__.strip()}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
