"""Cache-lifetime discipline for lazily-returned query plans.

Operators persist an intermediate frame when it feeds multiple branches of
the plan they return (signature indexes, inverted indexes). The action
runs in the CALLER, so the operator cannot unpersist in a finally block —
but never unpersisting leaks executor storage memory across invocations in
a long-lived session serving many queries (the CacheManager
"already cached" accumulation).

``persist_for`` ties the cached frame's lifetime to the returned result:
a ``weakref.finalize`` on the result DataFrame unpersists the intermediate
as soon as the caller drops its last reference (CPython refcounting makes
that prompt — right after the harness finishes collecting). While the
result is alive, every action it runs still hits the cache; a re-invocation
builds a fresh plan and its own cache, so release is always safe.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _safe_unpersist(cached: DataFrame) -> None:
    try:
        cached.unpersist()
    except Exception:
        # session already stopped / JVM gone — nothing left to release
        pass


def persist_for(cached: DataFrame, result: DataFrame) -> DataFrame:
    """Unpersist ``cached`` when ``result`` is garbage-collected.

    Returns ``result`` for chaining. ``cached`` must already be persisted
    (or checkpointed); double-release is harmless (unpersist is idempotent).
    """
    weakref.finalize(result, _safe_unpersist, cached)
    return result


class MaterializedIndexCache:
    """Bounded LRU registry of materialized (persisted + computed) index
    frames, keyed by (application id, index name, dataset).

    Index-building operators (MinHash signatures, LSH band tables,
    centroid sets) are exactly the frames a serving engine would build
    once and probe many times — rebuilding them per query throws away the
    index's whole point, while per-query persists either leak (never
    released) or thrash (released with the result, so the next identical
    query rebuilds). This registry is the middle: repeat invocations in a
    long-lived session reuse the materialized frame, the LRU bound caps
    executor storage, and eviction unpersists immediately — the
    accumulation the round-2 review flagged cannot recur.

    Builders must return an ALREADY materialized frame (persist + a cheap
    action): multi-referenced lazy caches get re-planned per reference by
    AQE as independent query-stage trees, recomputing the subtree before
    the cache fills. Entries are keyed by applicationId so frames from a
    stopped session are never returned (their eviction unpersist is a
    safe no-op). Invalidation on dataset mutation is out of scope — the
    engine's sources are immutable snapshots (TESTDATA parquet)."""

    def __init__(self, max_entries: int = 16) -> None:
        # 16, not 8: dedup_quality_report alone holds 8 live entries
        # (shingle_sets, minhash_sig/cand/verified, simhash{,64}_sig/
        # pairs); at 8, any 9th index in the same session (the
        # incremental miner's band index, a second sf_dir) evicted and
        # unpersisted a frame the report still referenced — correctness
        # survived via lineage recompute, but the build-once/probe-many
        # materialization guarantee silently degraded (r10 advice).
        # 16 fits one full quality-report pass + the incremental miner +
        # a second dataset's hot indexes. Each entry is a sampled/
        # signature-sized frame (MEMORY_AND_DISK), so the bound is about
        # predictable storage, not memory safety.
        import threading
        from collections import OrderedDict

        self.max_entries = max_entries
        self._lru: OrderedDict[tuple, DataFrame] = OrderedDict()
        self._lock = threading.Lock()

    def get_or_build(self, spark, name: str, dataset: str, build) -> DataFrame:
        key = (spark.sparkContext.applicationId, name, dataset)
        with self._lock:
            if key in self._lru:
                self._lru.move_to_end(key)
                return self._lru[key]
        df = build()  # outside the lock: builds run Spark jobs
        with self._lock:
            if key not in self._lru:
                self._lru[key] = df
            self._lru.move_to_end(key)
            while len(self._lru) > self.max_entries:
                _, old = self._lru.popitem(last=False)
                _safe_unpersist(old)
            return self._lru[key]

    def clear(self) -> None:
        with self._lock:
            for df in self._lru.values():
                _safe_unpersist(df)
            self._lru.clear()


#: Process-wide registry used by the index-building operators.
INDEX_CACHE = MaterializedIndexCache()
