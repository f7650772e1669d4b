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
