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

Evaluation mode (SPARK_GRAFT_SWEEP_EVAL): **noop is the DEFAULT since
round 8.** ``count`` lets Catalyst prune any output column the count
never reads, so a per-row transform or a full-ranking window can
silently measure as scan+count — that blind spot hid the customer
ranking ops' window wall through three rounds of artifacts (r5-r7)
until r7's forced-eval re-measure. ``noop`` writes through Spark's noop
sink, which evaluates EVERY output column; no future artifact can
under-measure by pruning. Set ``SPARK_GRAFT_SWEEP_EVAL=count`` as the
explicit cheap opt-out (cardinality-only screening at a fraction of the
cost); the artifact records which mode produced it (``eval_mode``).

Exclusions: SPARK_GRAFT_SWEEP_EXCLUDE=name1,name2 skips declared
sample-scale-only tiers (the uncapped ground-truth miners) and records
the skipped names in the artifact, so an exclusion is always visible
rather than silent. A query named explicitly on the command line always
runs, exclusion or not (a warning is printed when the two collide).

In noop mode the rows column comes from a separate count job whose time
is recorded per query as ``rows_sec`` and excluded from both ``sec``
and ``scale_sweep_total_sec`` (which is the SUM of per-query sec;
``wall_sec`` carries the full wall time) — so totals stay comparable
across eval modes and to pre-r9 count-mode artifacts.

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
    env_excl = os.environ.get("SPARK_GRAFT_SWEEP_EXCLUDE")
    if env_excl is None:
        # Default: the registry's declared sample-scale tiers (quadratic
        # ground-truth mines + the quality reports that embed one) —
        # declared once at the @register site, so a new ground-truth tier
        # can never silently enter a corpus-scale sweep because a human
        # forgot to re-type the env list. SPARK_GRAFT_SWEEP_EXCLUDE
        # (even set empty) overrides explicitly; exclusions are recorded
        # in-artifact either way.
        from psql_streamer_spark.registry import sample_scale_queries

        excluded = sorted(sample_scale_queries())
    else:
        excluded = [n for n in env_excl.split(",") if n]
    # Explicit CLI query args take precedence over the env exclusion
    # list: naming a query on the command line is a direct request to
    # run it. The exclusion only filters the implicit all-queries case;
    # overridden exclusions are warned about and recorded.
    if only:
        overridden = sorted(only & set(excluded))
        for n in overridden:
            print(
                f"warning: {n} is in SPARK_GRAFT_SWEEP_EXCLUDE but was "
                "requested explicitly on the command line — running it",
                file=sys.stderr,
            )
        names = [n for n in sorted(queries) if n in only]
        excluded = []  # nothing implicitly skipped in explicit mode
    else:
        names = [n for n in sorted(queries) if n not in excluded]

    results: dict[str, dict[str, float | int]] = {}
    errors: dict[str, dict] = {}
    t_all = time.time()
    # noop (FULL evaluation through Spark's noop sink) is the DEFAULT
    # since r8 — see the module docstring for why count() is a blind
    # spot. count remains the explicit cheap opt-out; in noop mode rows
    # are reported from a separate count so the artifact keeps its
    # cardinality column (that count is NOT included in sec).
    eval_mode = os.environ.get("SPARK_GRAFT_SWEEP_EVAL", "noop")
    measured_sec = 0.0
    for name in names:
        t0 = time.time()
        try:
            if eval_mode == "noop":
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                # The rows column comes from a SEPARATE count job; its
                # time is recorded as rows_sec and excluded from both
                # sec and scale_sweep_total_sec so the total stays
                # comparable to the per-query sum and to count-mode
                # artifacts. A count failure must not discard the
                # successfully measured noop time.
                rec: dict = {"sec": round(dt, 3)}
                t1 = time.time()
                try:
                    rec["rows"] = df.count()
                    rec["rows_sec"] = round(time.time() - t1, 3)
                except Exception:  # noqa: BLE001
                    rec["rows"] = None
                    rec["rows_err"] = (
                        traceback.format_exc(limit=3).splitlines()[-1]
                    )
            else:
                n = queries[name](spark, sf_dir).count()
                dt = time.time() - t0
                rec = {"sec": round(dt, 3), "rows": n}
            measured_sec += dt
            results[name] = rec
            print(json.dumps({"query": name, **rec}), flush=True)
        except Exception:
            dt = time.time() - t0
            measured_sec += dt
            # Record the errored query's sec alongside its error so the
            # invariant "value == sum of per-query sec" holds even on an
            # errored sweep (the time was spent and is counted in value,
            # so it must be attributable per-query).
            errors[name] = {
                "sec": round(dt, 3),
                "err": traceback.format_exc(limit=3).splitlines()[-1],
            }
            print(
                json.dumps({"query": name, **errors[name]}),
                flush=True,
            )
    summary = {
        "metric": "scale_sweep_total_sec",
        # sum of measured per-query sec (noop rows-count jobs excluded),
        # so the total matches the per-query column and count-mode runs
        "value": round(measured_sec, 3),
        "unit": "sec",
        "wall_sec": round(time.time() - t_all, 3),
        "sf_dir": sf_dir,
        "eval_mode": eval_mode,
        "excluded": excluded,
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
