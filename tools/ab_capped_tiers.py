"""Same-session A/B for the two df-capped n-gram pair tiers.

Adjudicates the one analogy-graded number on the books: at sf100 the
round-7 sweep read `dedup_ngram_containment_pairs_capped` at 307 s and
`dedup_ngram_jaccard_pairs_capped` at 400-427 s, and SCALE.md attributed
the span to run-to-run machine state BY ANALOGY (the two tiers share the
single-shuffle `_capped_pair_counts` mine verbatim and differ only in
the score expression over the final broadcast-sized joins). This tool
replaces the analogy with a measurement: both tiers run INTERLEAVED in
ONE session (counterbalanced order A,B,B,A so drift hits both equally),
forced-eval through the noop sink, results dropped + gc'd between runs
so each invocation builds and releases its own cache (persist_for).

If the two tiers' same-session times agree within the session's own
repeat spread, the sf100 span was machine state. If Jaccard is
consistently slower, the delta is real and the suspect is named: the
Jaccard score reads BOTH per-doc counts into a sum (ca.c + cb.c -
n_common) while containment takes least(ca.c, cb.c) — same joins, same
fan-in, so any real delta would have to come from the score expression
itself (it shouldn't; that is the point of measuring).

Usage:
    python tools/ab_capped_tiers.py [sf_dir] [rounds]
    SPARK_GRAFT_AB_OUT=SCALE_r09_sf100_ab.json python tools/ab_capped_tiers.py .scale/sf100 2
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from psql_streamer_spark.registry import all_queries
    from psql_streamer_spark.session import get_spark
    from psql_streamer_spark.warmup import warm_expression_paths

    spark = get_spark("ab_capped_tiers")
    warm_expression_paths(spark)
    queries = all_queries()
    tiers = (
        "dedup_ngram_containment_pairs_capped",
        "dedup_ngram_jaccard_pairs_capped",
    )

    # counterbalanced order: round 0 = A,B; round 1 = B,A; ...
    runs: list[dict] = []
    for r in range(rounds):
        order = tiers if r % 2 == 0 else tiers[::-1]
        for name in order:
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            rec = {"round": r, "query": name, "sec": dt}
            print(json.dumps(rec), flush=True)
            runs.append(rec)
            del df  # release persist_for's cache before the next run
            gc.collect()

    by = {
        name: sorted(x["sec"] for x in runs if x["query"] == name)
        for name in tiers
    }
    summary = {
        "metric": "ab_capped_tiers",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "eval_mode": "noop",
        "runs": runs,
        "per_tier_sec": by,
        # statistics.median averages the middle pair for even run counts
        # (the previous upper-middle-element pick overstated an even
        # list's median — max-of-2 for the 2-run case).
        "median_containment": round(statistics.median(by[tiers[0]]), 3),
        "median_jaccard": round(statistics.median(by[tiers[1]]), 3),
    }
    print(json.dumps(summary), flush=True)
    out = os.environ.get("SPARK_GRAFT_AB_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
