"""Deterministic testdata inflation: replicate an sf directory N-fold.

Purpose: prove the engine's scale claims by MEASUREMENT, not plan-shape
argument.  Everything in this repo has only ever executed at sf0.1
(~600k lineitem rows); this tool manufactures an sf1-equivalent (or any
factor) dataset from the driver-generated sf0.1 parquet so the bench and
the full query sweep can run at 10x and we can observe whether wall-times
scale linearly.

Design — each choice exists to keep the 10x workload HONEST (the naive
"copy the files 10 times" inflates some workloads quadratically and
leaves others untouched):

- region/nation stay FIXED (5 / 25 rows), exactly like TPC-H where the
  dimension tables do not grow with SF.  FK columns referencing them are
  left unchanged.
- Entity/fact tables (customer supplier part orders lineitem events
  documents embeddings) are replicated ``factor`` times.  Replica r
  offsets every synthetic key by ``r * KEY_STRIDE`` — primary keys AND
  the foreign keys that reference them move together, so referential
  integrity holds within each replica and the join fan-outs
  (orders-per-customer, lineitems-per-order, events-per-user) are
  preserved bit-for-bit.  Replica 0 is the original data unchanged.
- ``documents.text``: replica r>0 rewrites ~45% of words to a token
  derived from md5(word, r).  The SAME substitution applies to every doc
  in a replica, so near-dup pairs that exist inside the original corpus
  still exist inside every replica (near-dup DENSITY per doc is
  constant), while cross-replica copies share <55% of shingles and fall
  far below every miner's Jaccard/cosine threshold.  Without this, each
  doc would have factor-1 verbatim twins and the pair-mining output
  would grow O(factor^2) BY CONSTRUCTION — a fabricated super-linearity
  that measures the synthetic data, not the engine.
- ``embeddings.embedding``: replica r rotates the 64-dim vector by
  r*(64//factor) positions.  Rotation preserves norms and all
  intra-replica pairwise distances exactly (the original cluster
  structure exists in every replica) while cross-replica vectors
  decorrelate — same reasoning as the text substitution, applied to
  cosine space.  Past factor=64 the rotation ring wraps; wrapped
  generations additionally flip a generation-keyed deterministic sign
  pattern per dimension (uniform within a replica, so intra-replica
  geometry is still exact) to keep cross-replica copies decorrelated.
- Timestamps are NOT shifted: 10x events in the same time range means
  10x rows per window — which is precisely what data growth looks like
  to a windowed aggregation.

Everything is Spark-expression-only (xxhash64/md5/transform/slice —
no Python row path), so inflation itself runs at scale: the same tool
pointed at a cluster would inflate a 100 TB lake.

Usage:
    python tools/inflate.py [--src /root/testdata/sf0.1] \
        [--dst /root/repo/.scale/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

# One replica's key space: far above any key the driver generates at any
# sf it ships (max observed key at sf0.1 is o_orderkey=149,999), so
# replica key ranges can never collide.
KEY_STRIDE = 10**9

# Per-table (replicated-key columns).  Keys referencing the FIXED dims
# (n_nationkey, r_regionkey) are intentionally absent — those dims do not
# grow, so their FKs stay put.
_KEYED = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# Output file counts sized so sf1 partitions stay ~10-60 MiB — small
# enough to parallelize a local[32] scan, the same shape a real lake's
# writer would produce.
_OUT_FILES = {"lineitem": 32, "orders": 16, "events": 16}


def _with_replicas(df: DataFrame, factor: int) -> DataFrame:
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    return df.select("*", reps)


def _remap_keys(df: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    for k in keys:
        df = df.withColumn(k, (F.col(k) + F.col("__r").cast("long") * F.lit(KEY_STRIDE)).alias(k))
    return df


def _perturb_text(df: DataFrame) -> DataFrame:
    """Replica-keyed word substitution; replica 0 untouched.

    word -> first 8 hex chars of md5(word || r) for ~45% of words
    (selected by xxhash64(word, r) so the choice is deterministic and
    word-stable within a replica: repeated words rewrite identically,
    preserving repetition/TF structure for the quality scorers).
    """
    rewritten = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.when(
                F.pmod(F.xxhash64(w, F.col("__r")), F.lit(100)) < 45,
                F.substring(F.md5(F.concat(w, F.col("__r").cast("string"))), 1, 8),
            ).otherwise(w),
        ),
        " ",
    )
    df = df.withColumn(
        "text", F.when(F.col("__r") == 0, F.col("text")).otherwise(rewritten)
    )
    return df.withColumn("n_chars", F.length("text").cast("long"))


def _rotate_embedding(df: DataFrame, factor: int) -> DataFrame:
    dim = 64
    step = max(1, dim // factor)
    shift = (F.col("__r") * F.lit(step)) % F.lit(dim)
    emb = F.col("embedding")
    rotated = F.concat(
        F.slice(emb, shift + 1, F.lit(dim) - shift),
        F.slice(emb, F.lit(1), shift),
    )
    base = F.when(shift == 0, emb).otherwise(rotated)
    # Past factor=64 the rotation ring WRAPS: replicas r and r+64 would
    # carry bit-identical vectors — factor-1 planted cosine-1.0 twins per
    # vector, a fabricated O(factor^2) pair blow-up that measures the
    # synthetic data, not the engine (found preparing the sf10 sweep).
    # Wrapped generations g = (r*step) // dim > 0 therefore apply a
    # generation-keyed deterministic sign flip per dimension: a uniform
    # +-1 pattern within a replica cancels in every intra-replica dot
    # product and norm (geometry exactly preserved), while cross-
    # generation copies of the same vector decorrelate. g=0 replicas
    # (every factor <= 64, i.e. all previously-built scale dirs) are
    # bit-for-bit unchanged.
    gens = ((factor - 1) * step) // dim + 1
    if gens > 1:
        g = F.floor((F.col("__r") * F.lit(step)) / F.lit(dim)).cast("int")
        parity = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit("flip"), g.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("bigint")
        )
        # dimension d's sign: bit d of a 64-bit generation hash (two md5
        # words), deterministic and expression-only
        parity2 = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("flip2"), g.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        # bit (i % 32) of the generation word, extracted arithmetically
        # (shiftright needs a literal shift amount; powers of two are
        # exact doubles, so floor(word / 2^b) % 2 is the exact bit)
        base = F.when(g == 0, base).otherwise(
            F.transform(
                base,
                lambda x, i: x
                * F.when(
                    F.floor(
                        F.when(i < 32, parity).otherwise(parity2)
                        / F.pow(F.lit(2.0), (i % 32).cast("double"))
                    ).cast("bigint")
                    % 2
                    == 1,
                    F.lit(-1.0),
                ).otherwise(F.lit(1.0)),
            )
        )
    return df.withColumn("embedding", base.cast("array<float>"))


def inflate(
    spark: SparkSession,
    src: str,
    dst: str,
    factor: int,
    tables: list[str] | None = None,
) -> None:
    """``tables`` restricts which entity tables are inflated (fixed dims
    are always copied) — at factor 1000 the full lake is dominated by
    lineitem (~14 GB single-host), which no documents/embeddings
    scale-tier op reads; building only the tables under test keeps the
    1000x decade runnable on one machine's disk."""
    os.makedirs(dst, exist_ok=True)
    for name in ("region", "nation"):
        spark.read.parquet(os.path.join(src, f"{name}.parquet")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{name}.parquet"))
        print(f"  {name}: copied (fixed dim)")
    for name, keys in _KEYED.items():
        if tables is not None and name not in tables:
            continue
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        out = _remap_keys(_with_replicas(df, factor), keys)
        if name == "documents":
            out = _perturb_text(out)
        elif name == "embeddings":
            out = _rotate_embedding(out, factor)
        out = out.drop("__r").repartition(_OUT_FILES.get(name, 8))
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
        n = spark.read.parquet(os.path.join(dst, f"{name}.parquet")).count()
        print(f"  {name}: {n} rows ({factor}x)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="entity tables to inflate (default: all); fixed dims always copied",
    )
    args = ap.parse_args()

    from psql_streamer_spark.session import get_spark

    spark = get_spark("inflate")
    print(f"inflating {args.src} -> {args.dst} x{args.factor}")
    inflate(spark, args.src, args.dst, args.factor, tables=args.tables)
    print("done")


if __name__ == "__main__":
    main()
