"""Embedding-decontamination corpus-scaling: the linear-scan claim, measured.

`decontaminate_embedding_cosine` is declared sample_scale=True because the
SYNTHETIC eval stand-in (label == 9) grows with sf — making the registered
op quadratic on the synthetic layout. The production claim is that with a
real CONSTANT-SIZE eval battery the op is one linear broadcast scan of the
corpus. This tool measures that claim: the battery is FIXED (the sf0.01
label-9 vectors, 53 of them, loaded from the same dir at every point) and
the corpus scales 2k -> 20k -> 200k vectors (sf0.1 and its 10x/100x
inflations — build with tools/inflate.py --tables embeddings). Per point:
cold wall-clock of the full screen (exact-fold cosines, broadcast battery,
map-side partial MAX — the registered op's exact shape), corpus rows/sec,
and the flagged count for sanity. Linear = flat-ish rows/sec across the
decade-times-two.

Each point runs in its own subprocess; loadavg recorded in-band.

Usage:
    SPARK_GRAFT_EMBED_DECONTAM_OUT=EMBED_DECONTAM_r12.json \\
        python tools/embed_decontam_scale.py [corpus_dir ...]
    python tools/embed_decontam_scale.py --point /root/repo/.scale/sf1e
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_DIR = "/root/testdata/sf0.01"  # fixed battery source at every point
DEFAULT_POINTS = (
    "/root/testdata/sf0.1",
    "/root/repo/.scale/sf1e",
    "/root/repo/.scale/sf10e",
)


def point(corpus_dir: str) -> None:
    import pyspark.sql.functions as F

    from psql_streamer_spark.operators.mlprep import (
        EMBED_DECONTAM_LABEL,
        EMBED_DECONTAM_THRESHOLD,
    )
    from psql_streamer_spark.session import get_spark

    spark = get_spark("embed_decontam_scale")
    rec: dict = {"corpus_dir": corpus_dir}
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    def prep(df):
        e = df.select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
        )
        dot_self = F.aggregate(
            F.transform(F.col("e"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return e.select("vec_id", "label", "e", F.sqrt(dot_self).alias("nrm"))

    ev = (
        prep(spark.read.parquet(f"{EVAL_DIR}/embeddings.parquet"))
        .filter(F.col("label") == EMBED_DECONTAM_LABEL)
        .select(F.col("e").alias("ee"), F.col("nrm").alias("enrm"))
    )
    rec["eval_vectors"] = ev.count()

    corpus = prep(spark.read.parquet(f"{corpus_dir}/embeddings.parquet")).select(
        "vec_id", "e", "nrm"
    )
    rec["corpus_vectors"] = corpus.count()

    dot_ab = F.aggregate(
        F.zip_with(F.col("e"), F.col("ee"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = dot_ab / (F.col("nrm") * F.col("enrm"))
    t0 = time.time()
    flagged = (
        corpus.crossJoin(F.broadcast(ev))
        .select("vec_id", cosine.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_cosine"))
        .agg(F.count_if(F.col("max_cosine") >= EMBED_DECONTAM_THRESHOLD))
        .collect()[0][0]
    )
    rec["screen_sec"] = round(time.time() - t0, 3)
    rec["flagged"] = int(flagged)
    rec["corpus_rows_per_sec"] = int(rec["corpus_vectors"] / max(rec["screen_sec"], 1e-9))
    print(json.dumps(rec))


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--point":
        point(sys.argv[2])
        return 0

    points = sys.argv[1:] or list(DEFAULT_POINTS)
    out = os.environ.get("SPARK_GRAFT_EMBED_DECONTAM_OUT", "EMBED_DECONTAM.json")
    results = []
    for p in points:
        if not os.path.isdir(p):
            print(f"skip {p}: not a directory", file=sys.stderr)
            continue
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--point", p],
            capture_output=True,
            text=True,
            check=False,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode != 0 or not line:
            print(f"FAILED {p}:\n{r.stderr[-2000:]}", file=sys.stderr)
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
