"""Isolated 3-run pin for the sim_bruteforce_topk sf0.1 constant.

BENCH_r05..r08 show sim_bruteforce_topk's warm-best drifting 0.578 ->
0.766 -> 0.717 s with no code change on its path; the r8 verdict asked
for three isolated runs of the registered salted two-phase form against
a single-window variant at the bench scale (20k vectors, 10 queries) to
decide whether the two-phase ranking's fixed overhead (an extra shuffle
of the |queries| x 64 x k survivor frame) is what the bench pays at a
size where the window wall it removes does not exist.

Run this script once per measurement — each invocation is a fresh
session (the isolated protocol). It times BOTH forms, counterbalancing
order by the --flip flag so scan warmth hits each form equally across
the 3-run set (run it with and without --flip).

    for i in 1 2 3; do python tools/pin_bruteforce.py $([ $((i%2)) = 0 ] && echo --flip); done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _forms():
    from psql_streamer_spark.functions.ranking import salted_topk
    from psql_streamer_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _dot,
        _norm,
        _vectors,
    )

    def scored(spark, sf_dir):
        v = _vectors(spark, sf_dir).withColumn("nrm", _norm(F.col("e")))
        q = v.filter(F.col("vec_id") < N_QUERIES)
        return (
            F.broadcast(q.alias("q"))
            .join(v.alias("c"), F.col("q.vec_id") != F.col("c.vec_id"))
            .select(
                F.col("q.vec_id").alias("query_id"),
                F.col("c.vec_id").alias("neighbor_id"),
                (
                    _dot(F.col("q.e"), F.col("c.e"))
                    / (F.col("q.nrm") * F.col("c.nrm"))
                ).alias("cosine"),
            )
        )

    def salted(spark, sf_dir):
        return salted_topk(
            scored(spark, sf_dir),
            ["query_id"],
            [F.desc("cosine"), F.asc("neighbor_id")],
            TOP_K,
            F.col("neighbor_id"),
        ).select("query_id", "neighbor_id", "cosine", "rank")

    def single_window(spark, sf_dir):
        w = W.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored(spark, sf_dir)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )

    return salted, single_window


def main() -> None:
    flip = "--flip" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.warmup import warm_expression_paths

    spark = get_spark("pin_bruteforce")
    warm_expression_paths(spark)
    salted, single = _forms()
    order = [("single_window", single), ("salted", salted)]
    if flip:
        order.reverse()

    rec = {"sf_dir": sf_dir, "order": [n for n, _ in order]}
    for name, fn in order:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rec[name + "_sec"] = round(time.time() - t0, 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
