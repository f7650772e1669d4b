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
    _unique_rows,
    _unique_rows_dict,
    screen_delta_group_pairs,
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


# --------------------------------------------------------------------------
# r17: vectorized _unique_rows (hash-sort-verify) vs the r16 dict oracle,
# and the group-level delta screen the collapsed mm index probes with.
# --------------------------------------------------------------------------
def _grouping_key(uniq, inv):
    """Canonical (member-partition) form of a grouping, independent of
    group numbering: frozenset of frozensets of row indices, plus the
    byte-exact group vectors keyed by one member."""
    parts: dict[int, list[int]] = {}
    for i, g in enumerate(inv):
        parts.setdefault(int(g), []).append(i)
    return (
        frozenset(frozenset(v) for v in parts.values()),
        {frozenset(v): uniq[g].tobytes() for g, v in parts.items()},
    )


@pytest.mark.parametrize("seed", [0, 5, 19])
def test_unique_rows_matches_dict_reference(seed):
    m, _ = _replica_bucket(seed, n_uniq=40, dim=8)
    got = _grouping_key(*_unique_rows(m))
    want = _grouping_key(*_unique_rows_dict(np.ascontiguousarray(m)))
    assert got == want


def test_unique_rows_bit_exact_on_nan_and_signed_zero():
    nan1 = np.float64(np.nan)
    nan2 = np.frombuffer(
        np.array([0x7FF8000000000001], dtype=np.uint64).tobytes(), np.float64
    )[0]  # a DIFFERENT NaN payload
    m = np.array(
        [
            [0.0, 1.0],
            [-0.0, 1.0],  # distinct from [0.0, 1.0] byte-wise
            [0.0, 1.0],
            [nan1, 2.0],
            [nan2, 2.0],  # distinct from nan1 byte-wise
            [nan1, 2.0],
        ]
    )
    uniq, inv = _unique_rows(m)
    assert len(uniq) == 4
    assert inv[0] == inv[2] and inv[0] != inv[1]
    assert inv[3] == inv[5] and inv[3] != inv[4]


def test_unique_rows_collision_fallback(monkeypatch):
    """Force every row onto one 64-bit hash: the run contains distinct
    rows, so the vectorized path must detect the collision and defer to
    the exact dict pass."""
    import psql_streamer_spark.operators.dedup as dd

    monkeypatch.setattr(
        dd, "_row_hash64", lambda hv: np.zeros(len(hv), dtype=np.uint64)
    )
    m, _ = _replica_bucket(23, n_uniq=15, dim=8)
    got = _grouping_key(*dd._unique_rows(m))
    want = _grouping_key(*dd._unique_rows_dict(np.ascontiguousarray(m)))
    assert got == want


def test_unique_rows_empty_and_singleton():
    uniq, inv = _unique_rows(np.empty((0, 4)))
    assert len(uniq) == 0 and len(inv) == 0
    uniq, inv = _unique_rows(np.array([[1.0, 2.0]]))
    assert len(uniq) == 1 and list(inv) == [0]


def _brute_group_pairs(m, gids, new_mask, thr):
    """Reference for screen_delta_group_pairs: oriented (new gid, any
    gid incl. self) pairs at cosine >= thr."""
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ni = np.nonzero(new_mask)[0]
    sims = mn[ni] @ mn.T
    ai, bi = np.nonzero(sims >= thr)
    return set(zip(gids[ni[ai]], gids[bi]))


@pytest.mark.parametrize("seed", [2, 9, 31])
@pytest.mark.parametrize("thr", [0.999, 0.9])
def test_screen_delta_group_pairs_matches_bruteforce(seed, thr):
    m, gids = _replica_bucket(seed, n_uniq=10)
    rng = np.random.default_rng(seed + 7)
    new_mask = rng.random(len(gids)) < 0.3
    if not new_mask.any():
        new_mask[0] = True
    lo, hi = screen_delta_group_pairs(m, gids, new_mask, thr)
    assert set(zip(lo, hi)) == _brute_group_pairs(m, gids, new_mask, thr)


def test_screen_delta_group_pairs_keeps_self_pairs():
    """A new group must pair with ITSELF (the caller's member expansion
    surfaces within-group replica pairs from it) and with identical-
    vector sibling rows, oriented new-side first."""
    v = np.array([1.0, 2.0])
    m = np.stack([v, v, np.array([-2.0, 1.0])])  # row 2 orthogonal
    gids = np.asarray([7, 8, 9], dtype=np.int64)
    new_mask = np.asarray([True, False, False])
    lo, hi = screen_delta_group_pairs(m, gids, new_mask, 0.999)
    assert set(zip(lo, hi)) == {(7, 7), (7, 8)}
