"""r17 VERDICT #5: interleave two-level prefix-sum crossover measurement.

Two instruments, because the full operator cannot reach the scale where
the r15->r16 fix matters on one machine:

1. FULL-OP 3-point curve (sf1 / sf10d / sf100d = 50k / 500k / 5M docs),
   both arms: the committed two-level `interleave_sources_frame` vs the
   r15 single-level prefix-sum (reconstructed below from
   `git show c5030a3^`).  The bucket-count table is ~N/4096 rows
   (12 / 122 / 1221 rows at these points), so BOTH arms' prefix-sum cost
   is invisible here — this curve bounds the two-level arm's fixed
   overhead (2 extra tiny stages) as N grows.

2. ISOLATED prefix-sum A/B on synthetic bucket-count tables of 1M / 10M /
   100M rows — the sizes a real corpus produces (a trillion-doc corpus
   has ~244M buckets).  Arms compute the identical exclusive cumulative
   sum (equality asserted at the smallest point); single-level runs the
   whole table through ONE WindowExec task, two-level hash-partitions
   level 1 by coarse group.  This is the component the r16 fix bounds.

Usage: python tools/interleave_scale_r17.py [--skip-full] [--skip-iso]
Writes SCALE_r17_interleave.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W, functions as F

from psql_streamer_spark.operators.mlprep import (
    INTERLEAVE_BUCKET_DOCS,
    INTERLEAVE_COARSE_BUCKETS,
    INTERLEAVE_SUB_STREAMS,
    INTERLEAVE_VT_SCALE,
    interleave_sources_frame,
    md5_bucket,
)
from psql_streamer_spark.session import get_spark
from psql_streamer_spark.sources.tables import load_table

POINTS = [
    ("sf1", "/root/repo/.scale/sf1"),
    ("sf10d", "/root/repo/.scale/sf10d"),
    ("sf100d", "/root/repo/.scale/sf100d"),
]


def interleave_single_level(d: DataFrame) -> DataFrame:
    """The r15 body (pre-c5030a3), byte-for-byte except this docstring:
    global bucket offsets via ONE partition-less window over the whole
    bucket-count table."""
    from psql_streamer_spark.functions.text_hash import words_expr

    nt = d.select("doc_id", "source", F.size(words_expr()).alias("nt"))
    stats = nt.groupBy("source").agg(
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(F.sqrt(F.sum("nt").cast("bigint"))).cast("bigint"),
        ).alias("weight_units")
    )
    sub = md5_bucket(F.col("doc_id"), INTERLEAVE_SUB_STREAMS)
    base = nt.select(
        "doc_id",
        "source",
        sub.alias("sub"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w_sub = W.partitionBy("source", "sub").orderBy("h", "doc_id")
    ranked = base.withColumn("rn_sub", F.row_number().over(w_sub))
    w_off = (
        W.partitionBy("source")
        .orderBy("sub")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        ranked.groupBy("source", "sub")
        .agg(F.count("*").alias("c"))
        .withColumn("off", F.coalesce(F.sum("c").over(w_off), F.lit(0)))
        .select("source", "sub", "off")
    )
    r = ranked.join(F.broadcast(offsets), ["source", "sub"]).select(
        "doc_id",
        "source",
        (F.col("off") + F.col("rn_sub")).cast("bigint").alias("src_rank"),
    )
    v = r.join(F.broadcast(stats), "source").withColumn(
        "vt",
        F.expr(
            f"CAST((src_rank * {INTERLEAVE_VT_SCALE}) div weight_units"
            " AS BIGINT)"
        ),
    )
    span_df = stats.agg(
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(
                f"CAST({INTERLEAVE_BUCKET_DOCS * INTERLEAVE_VT_SCALE}L"
                " div sum(weight_units) AS BIGINT)"
            ),
        ).alias("span")
    )
    b = v.crossJoin(F.broadcast(span_df)).withColumn(
        "bucket", F.expr("CAST(vt div span AS BIGINT)")
    )
    w_boff = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    boff = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("bc"))
        .withColumn("boff", F.coalesce(F.sum("bc").over(w_boff), F.lit(0)))
        .select("bucket", "boff")
    )
    w_in = W.partitionBy("bucket").orderBy("vt", "source", "doc_id")
    return (
        b.join(boff, "bucket")
        .withColumn(
            "position",
            (F.col("boff") + F.row_number().over(w_in) - 1).cast("bigint"),
        )
        .select(
            "doc_id", "source", "src_rank", "weight_units", "vt", "position"
        )
    )


def prefix_single(bc: DataFrame) -> DataFrame:
    """Exclusive cumulative count over (bucket, bc): one global window."""
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    return bc.withColumn(
        "boff", F.coalesce(F.sum("bc").over(w), F.lit(0))
    ).select("bucket", "boff")


def prefix_two_level(bc: DataFrame) -> DataFrame:
    """The committed two-level idiom over the same (bucket, bc) frame."""
    bc = bc.withColumn(
        "coarse",
        F.expr(f"CAST(bucket div {INTERLEAVE_COARSE_BUCKETS} AS BIGINT)"),
    )
    w_within = (
        W.partitionBy("coarse").orderBy("bucket").rowsBetween(
            W.unboundedPreceding, -1
        )
    )
    w_coarse = W.orderBy("coarse").rowsBetween(W.unboundedPreceding, -1)
    coarse_off = (
        bc.groupBy("coarse")
        .agg(F.sum("bc").alias("cc"))
        .withColumn(
            "coarse_off", F.coalesce(F.sum("cc").over(w_coarse), F.lit(0))
        )
        .select("coarse", "coarse_off")
    )
    return (
        bc.withColumn(
            "within_off", F.coalesce(F.sum("bc").over(w_within), F.lit(0))
        )
        .join(F.broadcast(coarse_off), "coarse")
        .select(
            "bucket",
            (F.col("coarse_off") + F.col("within_off")).alias("boff"),
        )
    )


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def loadavg() -> float:
    return os.getloadavg()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--skip-iso", action="store_true")
    args = ap.parse_args()

    spark = get_spark("interleave_scale_r17")
    out: dict = {"loadavg_start": loadavg(), "full_op": [], "isolated_prefix": []}

    if not args.skip_full:
        for tag, path in POINTS:
            if not os.path.isdir(path):
                print(f"skip {tag}: {path} missing", flush=True)
                continue
            d = load_table(spark, "documents", path)
            n = d.count()
            for arm, fn in (
                ("two_level", interleave_sources_frame),
                ("single_level", interleave_single_level),
            ):
                times = []
                for i in range(3):
                    spark.sparkContext.setJobDescription(
                        f"interleave {tag} {arm} iter{i}"
                    )
                    t0 = time.monotonic()
                    noop(fn(d))
                    times.append(round(time.monotonic() - t0, 3))
                row = {
                    "point": tag,
                    "docs": n,
                    "arm": arm,
                    "cold": times[0],
                    "warm": times[1:],
                    "best_warm": min(times[1:]),
                }
                out["full_op"].append(row)
                print(row, flush=True)
        # arms must produce identical output (checked at the smallest point)
        d = load_table(spark, "documents", POINTS[0][1])
        a = interleave_sources_frame(d)
        bfr = interleave_single_level(d)
        diff = a.exceptAll(bfr).count() + bfr.exceptAll(a).count()
        out["full_op_arms_equal_sf1"] = diff == 0
        print("arms equal at sf1:", diff == 0, flush=True)

    if not args.skip_iso:
        for n_buckets in (1_000_000, 10_000_000, 100_000_000):
            # synthetic bucket-count table with the real one's shape:
            # dense bucket ids, counts ~BUCKET_DOCS +- hash jitter
            bc = (
                spark.range(0, n_buckets, 1, 64)
                .select(
                    F.col("id").alias("bucket"),
                    (
                        F.lit(INTERLEAVE_BUCKET_DOCS)
                        + F.pmod(F.xxhash64("id"), F.lit(257))
                        - F.lit(128)
                    ).cast("bigint").alias("bc"),
                )
            )
            for arm, fn in (
                ("two_level", prefix_two_level),
                ("single_level", prefix_single),
            ):
                times = []
                for i in range(3):
                    spark.sparkContext.setJobDescription(
                        f"prefix {n_buckets} {arm} iter{i}"
                    )
                    t0 = time.monotonic()
                    noop(fn(bc))
                    times.append(round(time.monotonic() - t0, 3))
                row = {
                    "n_buckets": n_buckets,
                    "arm": arm,
                    "cold": times[0],
                    "warm": times[1:],
                    "best_warm": min(times[1:]),
                }
                out["isolated_prefix"].append(row)
                print(row, flush=True)
        bc_small = (
            spark.range(0, 100_000, 1, 8)
            .select(
                F.col("id").alias("bucket"),
                (
                    F.lit(INTERLEAVE_BUCKET_DOCS)
                    + F.pmod(F.xxhash64("id"), F.lit(257))
                    - F.lit(128)
                ).cast("bigint").alias("bc"),
            )
        )
        diff = (
            prefix_two_level(bc_small).exceptAll(prefix_single(bc_small)).count()
            + prefix_single(bc_small).exceptAll(prefix_two_level(bc_small)).count()
        )
        out["isolated_arms_equal_100k"] = diff == 0
        print("isolated arms equal at 100k:", diff == 0, flush=True)

    out["loadavg_end"] = loadavg()
    with open("/root/repo/SCALE_r17_interleave.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written SCALE_r17_interleave.json", flush=True)


if __name__ == "__main__":
    main()
