"""Distributed ranking primitives.

Low-cardinality (or empty) PARTITION BY ranking windows sort their whole
input on |partitions| threads — the scale-wall class diagnosed twice in
round 7 (`text_top_ngrams_per_source`: 105 s of a 105 s op was one
|sources|-thread window at sf30; `cdc_wal_gap_audit`: same latent shape).
This module carries the reusable forms so new operators don't re-grow the
wall:

- ``salted_topk``: lossless two-phase per-group top-k for
  ROW_NUMBER()-style rankings. A true global top-k row has fewer than k
  rows ahead of it overall, hence fewer than k ahead within its own salt
  cell, so ranking within (group, salt) cells and keeping k per cell loses
  nothing; the survivor frame (|groups| * n_salts * k rows) is the only
  thing the final group-partitioned window ever sees. Requires a total
  order (deterministic tiebreak column) — which every registered top-k op
  already guarantees for cross-engine hash stability.

The exact RANK/DENSE_RANK/NTILE decomposition over order-respecting value
buckets (full ranking output, not top-k) lives with its two call sites in
``operators/windows.py`` — it needs per-op knowledge of the ORDER BY key's
value range to pick bucket boundaries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def salted_topk(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_col: Column,
    n_salts: int = 64,
    rank_name: str = "rank",
) -> DataFrame:
    """Per-group top-k by ROW_NUMBER over a total order, in two phases.

    Phase 1 ranks within (part_cols..., xxhash64(salt_col) % n_salts) —
    |groups| * n_salts reducers instead of |groups| — and keeps k rows per
    cell (lossless, see module docstring). Phase 2 ranks the tiny survivor
    frame under the group-only window and emits ``rank_name`` <= k.

    ``order_cols`` must define a total order within each group (break ties
    on a unique id); under a non-total order ROW_NUMBER top-k is
    nondeterministic with or without salting. ``salt_col`` should be a
    column that spreads rows within a group — the unique tiebreak id is
    the natural choice.
    """
    cells = df.withColumn("__salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salts)))
    w1 = W.partitionBy(*part_cols, "__salt").orderBy(*order_cols)
    survivors = (
        cells.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1", "__salt")
    )
    w2 = W.partitionBy(*part_cols).orderBy(*order_cols)
    return survivors.withColumn(rank_name, F.row_number().over(w2)).filter(
        F.col(rank_name) <= k
    )
