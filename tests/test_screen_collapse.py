"""Unique-vector collapse screens (r16): exact pair-set equality with the
uncollapsed brute-force screen on replica-heavy buckets.

The optimization these pin: hot hyperplane buckets from byte-identical
payloads (r15 verdict #1 — replicas share every bucket at any signature
width) are screened on np.unique rows with pair expansion afterwards, so
the matmul is O(unique^2) instead of O(bucket^2). These tests plant
replica clusters and assert the emitted (lo, hi) pair SET is identical to
the naive all-rows screen — the property the oracle hash-parity of
mm_dedup_embedding / dedup_embedding_lsh_pairs rests on.
"""

from __future__ import annotations

import numpy as np
import pytest

from psql_streamer_spark.operators.dedup import (
    screen_unique_delta_pairs,
    screen_unique_pairs,
)


def _brute_pairs(m, ids, thr):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ai, bi = np.nonzero(np.triu(mn @ mn.T >= thr, k=1))
    da, db = ids[ai], ids[bi]
    return set(zip(np.minimum(da, db), np.maximum(da, db)))


def _brute_delta_pairs(m, ids, new_mask, thr):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ni = np.nonzero(new_mask)[0]
    sims = mn[ni] @ mn.T
    ai, bi = np.nonzero(sims >= thr)
    da, db = ids[ni[ai]], ids[bi]
    keep = da != db
    da, db = da[keep], db[keep]
    return set(zip(np.minimum(da, db), np.maximum(da, db)))


def _replica_bucket(seed: int, n_uniq: int, dim: int = 16):
    """A bucket with replica clusters: n_uniq distinct vectors, each
    replicated 1..6 times, shuffled, ids unique."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 50, size=(n_uniq, dim)).astype(np.float64)
    rows, ids = [], []
    next_id = 100
    for i in range(n_uniq):
        for _ in range(int(rng.integers(1, 7))):
            rows.append(base[i])
            ids.append(next_id)
            next_id += 1
    order = rng.permutation(len(rows))
    return np.stack(rows)[order], np.asarray(ids, dtype=np.int64)[order]


@pytest.mark.parametrize("seed", [1, 7, 42])
@pytest.mark.parametrize("thr", [0.999, 0.97, 0.8])
def test_screen_unique_pairs_matches_bruteforce(seed, thr):
    m, ids = _replica_bucket(seed, n_uniq=12)
    lo, hi = screen_unique_pairs(m, ids, thr)
    assert set(zip(lo, hi)) == _brute_pairs(m, ids, thr)


@pytest.mark.parametrize("seed", [3, 11, 77])
@pytest.mark.parametrize("thr", [0.999, 0.97, 0.8])
def test_screen_unique_delta_pairs_matches_bruteforce(seed, thr):
    m, ids = _replica_bucket(seed, n_uniq=12)
    rng = np.random.default_rng(seed + 1000)
    new_mask = rng.random(len(ids)) < 0.3
    if not new_mask.any():
        new_mask[0] = True
    lo, hi = screen_unique_delta_pairs(m, ids, new_mask, thr)
    assert set(zip(lo, hi)) == _brute_delta_pairs(m, ids, new_mask, thr)


def test_screen_unique_pairs_all_replicas_single_group():
    """A pure replica bucket (the 100 TB boilerplate-logo case): one
    unique vector, k members -> all k*(k-1)/2 within-group pairs, no
    matmul blow-up."""
    v = np.array([3.0, 1.0, 4.0, 1.0])
    m = np.stack([v] * 9)
    ids = np.arange(9, dtype=np.int64) + 500
    lo, hi = screen_unique_pairs(m, ids, 0.99)
    assert len(lo) == 9 * 8 // 2
    assert set(zip(lo, hi)) == _brute_pairs(m, ids, 0.99)


def test_screen_unique_pairs_no_survivors():
    m = np.eye(4)  # orthogonal: no pair at any positive threshold
    ids = np.arange(4, dtype=np.int64)
    lo, hi = screen_unique_pairs(m, ids, 0.5)
    assert len(lo) == 0 and len(hi) == 0


def test_screen_unique_delta_pairs_replica_delta():
    """Delta rows that are byte-identical to indexed rows pair with every
    member but never with themselves."""
    v = np.array([1.0, 2.0])
    m = np.stack([v, v, v, np.array([2.0, 1.0])])
    ids = np.asarray([10, 11, 12, 13], dtype=np.int64)
    new_mask = np.asarray([True, False, False, False])
    lo, hi = screen_unique_delta_pairs(m, ids, new_mask, 0.999)
    assert set(zip(lo, hi)) == {(10, 11), (10, 12)}
