"""Decontamination scale points: broadcast-payload + wall-clock for the
exact gram-join screen vs the Bloom-bitmap probe.

The r12 `decontaminate_bloom_ngrams` claim is that the probe side's
broadcast payload is FIXED (BLOOM_M_BITS/8 bytes) no matter how large the
eval battery grows, while `decontaminate_ngram_overlap`'s broadcast is the
eval gram STRINGS (grows linearly with the battery). This tool measures
that claim instead of asserting it: at each sf dir it records

- eval-side size: distinct gram count and total gram bytes (what the
  exact screen ships to every executor) vs the constant bitmap bytes;
- bitmap build cost (the bounded positions collect + word-array assembly);
- cold wall-clock of three corpus screens, each forced with a count-style
  aggregate: the exact broadcast-join screen, the bloom-probe-ONLY screen
  (no join anywhere — the pure fixed-payload path), and the registered
  combined op (probe + exact column, what the oracle hash-checks);
- the measured false-positive overhead at that scale (bloom hits vs
  exact hits over all corpus grams).

Each scale point runs in its own subprocess (fresh session — the
isolation rationale of tools/recall_scale.py), with loadavg recorded
in-band per the BENCH_NOTES contention standard.

Usage:
    python tools/decontam_scale.py [sf_dir ...]
    # default: sf0.01 -> sf0.1 -> .scale/sf1 (the 5k/50k-doc decade;
    # build .scale/sf1 with tools/inflate.py first)
    SPARK_GRAFT_DECONTAM_OUT=DECONTAM_r12.json python tools/decontam_scale.py
    # child mode: one point
    python tools/decontam_scale.py --point /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_POINTS = (
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/root/repo/.scale/sf1",
)


def point(sf_dir: str) -> None:
    import pyspark.sql.functions as F

    from psql_streamer_spark.functions.text_hash import shingles_expr, with_words
    from psql_streamer_spark.operators.mlprep import (
        BLOOM_M_BITS,
        DECONTAM_EVAL_SOURCE,
        DECONTAM_K,
        _bloom_probe,
        _eval_bloom_positions,
        bloom_m_bits_for,
        bloom_words_df,
        build_bloom_words,
        decontaminate_bloom_ngrams,
    )
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.warmup import warm_expression_paths

    spark = get_spark("decontam_scale")
    warm_expression_paths(spark)
    rec: dict = {"sf_dir": sf_dir}
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    d = with_words(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    grams = shingles_expr(F.col("__words"), k=DECONTAM_K)
    corpus_grams = (
        d.filter(F.col("source") != DECONTAM_EVAL_SOURCE)
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    bench_grams = (
        d.filter(F.col("source") == DECONTAM_EVAL_SOURCE)
        .select(F.explode(grams).alias("bg"))
        .distinct()
    )

    # eval-side payload: what the exact screen broadcasts, vs the bitmap
    ev = bench_grams.agg(
        F.count("*").alias("n"), F.sum(F.length("bg")).alias("bytes")
    ).collect()[0]
    rec["eval_grams"] = ev.n
    rec["eval_gram_bytes"] = int(ev.bytes)
    rec["bitmap_bytes"] = BLOOM_M_BITS // 8
    rec["n_corpus_docs"] = d.filter(
        F.col("source") != DECONTAM_EVAL_SOURCE
    ).count()

    t0 = time.time()
    positions = _eval_bloom_positions(spark, sf_dir)
    words = build_bloom_words(positions)
    rec["bitmap_build_sec"] = round(time.time() - t0, 3)
    rec["bitmap_set_bits"] = len(positions)

    # (a) exact broadcast-join screen: per-doc shared-gram counts forced
    # through one aggregate (the decontaminate_ngram_overlap shape)
    t0 = time.time()
    exact_total = (
        corpus_grams.join(
            F.broadcast(bench_grams), F.col("g") == F.col("bg"), "left"
        )
        .groupBy("doc_id")
        .agg(F.count("bg").alias("h"))
        .agg(F.sum("h"))
        .collect()[0][0]
    )
    rec["exact_screen_sec"] = round(time.time() - t0, 3)
    rec["exact_hits"] = int(exact_total)

    # (b) bloom-probe-ONLY screen: the fixed-payload path (the one-row
    # broadcast word-array ships once per executor)
    t0 = time.time()
    bloom_total = (
        corpus_grams.crossJoin(F.broadcast(bloom_words_df(spark, words)))
        .withColumn("hit", _bloom_probe(F.col("g"), F.col("____bloom_words")))
        .groupBy("doc_id")
        .agg(F.count_if("hit").alias("h"))
        .agg(F.sum("h"))
        .collect()[0][0]
    )
    rec["bloom_screen_sec"] = round(time.time() - t0, 3)
    rec["bloom_hits"] = int(bloom_total)
    rec["false_positive_grams"] = int(bloom_total - exact_total)

    # (b') the same probe with the bitmap RE-SIZED for this battery
    # (bloom_m_bits_for: ~16 bits/gram) — the sizing rule the fixed-m
    # saturation point motivates; payload grows with the EVAL battery
    # only, never the corpus
    m_sized = bloom_m_bits_for(int(ev.n))
    rec["sized_m_bits"] = m_sized
    rec["sized_bitmap_bytes"] = m_sized // 8
    t0 = time.time()
    sized_positions = _eval_bloom_positions(spark, sf_dir, m_sized)
    sized_words = build_bloom_words(sized_positions, m_sized)
    rec["sized_bitmap_build_sec"] = round(time.time() - t0, 3)
    rec["sized_set_bits"] = len(sized_positions)
    t0 = time.time()
    sized_total = (
        corpus_grams.crossJoin(F.broadcast(bloom_words_df(spark, sized_words)))
        .withColumn(
            "hit", _bloom_probe(F.col("g"), F.col("____bloom_words"), m_sized)
        )
        .groupBy("doc_id")
        .agg(F.count_if("hit").alias("h"))
        .agg(F.sum("h"))
        .collect()[0][0]
    )
    rec["sized_screen_sec"] = round(time.time() - t0, 3)
    rec["sized_bloom_hits"] = int(sized_total)
    rec["sized_false_positive_grams"] = int(sized_total - exact_total)

    # (c) the registered combined op (probe + exact column, hash-checked)
    t0 = time.time()
    decontaminate_bloom_ngrams(spark, sf_dir).agg(
        F.sum("n_grams")
    ).collect()
    rec["registered_op_sec"] = round(time.time() - t0, 3)

    print(json.dumps(rec))


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--point":
        point(sys.argv[2])
        return 0

    points = sys.argv[1:] or list(DEFAULT_POINTS)
    out = os.environ.get("SPARK_GRAFT_DECONTAM_OUT", "DECONTAM.json")
    results = []
    for sf_dir in points:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: not a directory", file=sys.stderr)
            continue
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--point", sf_dir],
            capture_output=True,
            text=True,
            check=False,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode != 0 or not line:
            print(f"FAILED {sf_dir}:\n{r.stderr[-2000:]}", file=sys.stderr)
            return 1
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec))
    with open(out, "w") as f:
        json.dump({"points": results}, f, indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
