"""Full-surface scale sweep: execute EVERY registered query at a given
sf directory, rows-only, recording wall-time and row count per query.

This is the complement to ``tools/oracle_check.py`` (which proves
CORRECTNESS at sf0.01 against DuckDB): the sweep proves the whole query
surface EXECUTES at 10x the bench scale — no OOM, no spill collapse, no
operator whose runtime curves super-linearly — by running it and
measuring.  Compare a sweep at ``.scale/sf1`` (built by
``tools/inflate.py``) against one at ``/root/testdata/sf0.1``: a healthy
operator's time ratio at 10x data sits well under ~10x on local[32]
(scans and shuffles parallelize; fixed per-query overhead amortizes).

Output: one JSON line per query on stdout
    {"query": name, "sec": t, "rows": n}
and a final summary line
    {"metric": "scale_sweep_total_sec", "value": T, "sf_dir": ...,
     "queries_ok": k, "queries_err": e, "errors": {...}}

Usage:
    python tools/scale_sweep.py [sf_dir] [query ...]
    SPARK_GRAFT_SWEEP_OUT=SCALE_r05.json python tools/scale_sweep.py .scale/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    only = set(sys.argv[2:])

    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.warmup import warm_expression_paths

    spark = get_spark("scale_sweep")
    warm_expression_paths(spark)

    queries = all_queries()
    names = [n for n in sorted(queries) if not only or n in only]

    results: dict[str, dict[str, float | int]] = {}
    errors: dict[str, str] = {}
    t_all = time.time()
    # SPARK_GRAFT_SWEEP_EVAL=noop forces FULL evaluation through Spark's
    # noop sink. The default count() surfaces result cardinality (the
    # super-linearity tell for pair miners) but lets the optimizer PRUNE
    # unreferenced columns — a per-row transform or a full-ranking window
    # whose outputs count() never reads measures as scan+count (this is
    # how the customer ranking ops' window wall stayed invisible in the
    # r5-r7 sweeps). noop mode evaluates every output column; rows are
    # then reported from a separate count so the artifact keeps its
    # cardinality column (that count is NOT included in sec).
    eval_mode = os.environ.get("SPARK_GRAFT_SWEEP_EVAL", "count")
    for name in names:
        t0 = time.time()
        try:
            if eval_mode == "noop":
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                n = df.count()
            else:
                n = queries[name](spark, sf_dir).count()
                dt = time.time() - t0
            results[name] = {"sec": round(dt, 3), "rows": n}
            print(json.dumps({"query": name, "sec": round(dt, 3), "rows": n}), flush=True)
        except Exception:
            dt = time.time() - t0
            errors[name] = traceback.format_exc(limit=3).splitlines()[-1]
            print(
                json.dumps({"query": name, "sec": round(dt, 3), "error": errors[name]}),
                flush=True,
            )
    summary = {
        "metric": "scale_sweep_total_sec",
        "value": round(time.time() - t_all, 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "queries_ok": len(results),
        "queries_err": len(errors),
        "errors": errors,
        "queries": results,
    }
    print(json.dumps(summary), flush=True)
    out = os.environ.get("SPARK_GRAFT_SWEEP_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
