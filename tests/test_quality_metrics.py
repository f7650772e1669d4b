"""Quality assertions beyond oracle parity: approximate operators must be
USEFUL approximations of their exact counterparts, and stubs must fail
loudly rather than fake silently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psql_streamer_spark.registry import all_queries
from tests.conftest import SF_SMALL

QUERIES = all_queries()


@pytest.fixture(scope="module")
def sfdir():
    # sf0.001 documents/embeddings are identical row counts to sf0.01's
    # little sibling; quality numbers are asserted loosely.
    return SF_SMALL


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sfdir):
    gt = _pairs(QUERIES["dedup_ngram_jaccard_pairs"](spark, sfdir))
    lsh = _pairs(QUERIES["dedup_minhash_lsh_pairs"](spark, sfdir))
    if not gt:
        pytest.skip("no near-dup pairs at this sf")
    recall = len(gt & lsh) / len(gt)
    # 4 bands x 4 rows at j>=0.8: per-band hit prob 0.8^4=0.41,
    # miss prob (1-0.41)^4 ~ 12% per pair; demand >=70% overall.
    assert recall >= 0.7, f"LSH recall {recall}"


def test_simhash_pairs_overlap_ground_truth(spark, sfdir):
    gt = _pairs(QUERIES["dedup_ngram_jaccard_pairs"](spark, sfdir))
    sh = _pairs(QUERIES["dedup_simhash_pairs"](spark, sfdir))
    if not gt:
        pytest.skip("no near-dup pairs at this sf")
    assert len(gt & sh) / len(gt) >= 0.5


def test_ann_recall_vs_bruteforce(spark, sfdir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_bruteforce_topk"](spark, sfdir).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_lsh_topk"](spark, sfdir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_ivf_topk"](spark, sfdir).collect()
    }
    # random unclustered vectors are LSH's worst case; assert the floor
    assert len(exact & lsh) / len(exact) >= 0.15
    assert len(exact & ivf) / len(exact) >= 0.3


def test_recall_report_floors_at_sf01(spark):
    """The registered recall report (hash-checked vs DuckDB at sf0.01)
    must clear documented quality floors at sf0.1: measured recall@10 is
    LSH 0.49 / stride-IVF 0.36 (RECALL_r10.json; deterministic data and
    hashes, so these are exact) — floors sit below with margin so the
    assert catches a knob change that collapses quality, not noise. The
    inflated sf10 decade point lives in tools/recall_scale.py output
    (LSH holds ~0.57; stride-IVF under the r11 corpus-scaled nprobe —
    constant 3/40 cell fraction, 34 probes at 447 cells — reads 0.49,
    decade flat-or-better vs the fixed-3-probe decay to 0.20 that
    RECALL_r10 measured). At sf0.1 the scaled default resolves to the
    same 3 probes, so these floors are unchanged by the knob."""
    rows = {
        r.tier: r
        for r in QUERIES["sim_recall_report"](
            spark, "/root/testdata/sf0.1"
        ).collect()
    }
    assert set(rows) == {"lsh", "lsh_wide", "ivf"}
    for r in rows.values():
        assert r.k == 10 and r.n_expected == 100
        assert r.recall == r.n_hits / r.n_expected
    assert rows["lsh"].recall >= 0.35, rows["lsh"]
    assert rows["ivf"].recall >= 0.20, rows["ivf"]
    # the wide OR-width tier (8 tables, measured 0.68 at sf0.1 / 0.87
    # at sf10) must strictly beat the 4-table default — that's its job
    assert rows["lsh_wide"].recall >= 0.55, rows["lsh_wide"]
    assert rows["lsh_wide"].recall > rows["lsh"].recall


def test_ivf_kmeans_recall_vs_bruteforce(spark, sfdir):
    """Trained-centroid IVF must clear the stride-sampled index's recall
    floor — trained cells are the whole point of wiring k-means in."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_bruteforce_topk"](spark, sfdir).collect()
    }
    ivf_km = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_ivf_kmeans_topk"](spark, sfdir).collect()
    }
    recall = len(exact & ivf_km) / len(exact)
    assert recall >= 0.3, f"kmeans-IVF recall {recall}"


def test_ivf_kmeans_topk_shape_and_determinism(spark, sfdir):
    df = QUERIES["sim_ivf_kmeans_topk"](spark, sfdir)
    rows = df.collect()
    assert rows, "kmeans-IVF returned no rows"
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
    # deterministic across invocations (localCheckpoint + stable init)
    again = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in QUERIES["sim_ivf_kmeans_topk"](spark, sfdir).collect()
    }
    assert {(r.query_id, r.neighbor_id, r.rank) for r in rows} == again


def test_embedding_lsh_pairs_subset_and_recall(spark, sfdir):
    """Bucketed pair mining must return a SUBSET of the brute-force pairs
    (same exact-cosine verify, candidates can only shrink the set), with
    non-trivial recall even on unclustered random vectors."""
    gt = _pairs(QUERIES["dedup_embedding_cosine_pairs"](spark, sfdir), "vec_a", "vec_b")
    lsh = _pairs(QUERIES["dedup_embedding_lsh_pairs"](spark, sfdir), "vec_a", "vec_b")
    if not gt:
        pytest.skip("no cosine near-dup pairs at this sf")
    assert lsh <= gt
    recall = len(gt & lsh) / len(gt)
    # pairs at cosine ~0.4-0.5 on random vectors: per-table collision
    # prob ~ (1 - theta/pi)^4 ~ 0.2, OR over 4 tables ~ 0.6; floor at 0.3
    assert recall >= 0.3, f"embedding LSH pair recall {recall}"


def test_blocked_blas_cosine_pairs_exact_parity(spark, sfdir):
    """The blocked-BLAS brute-force tier computes the SAME all-pairs
    semantics as the expression-fold tier — pair sets must match exactly
    (not recall-bounded: both are exhaustive O(N^2), only the FLOP path
    differs). Pins that the block-pair replication covers every (a, b)
    exactly once: diagonal blocks via within-L triangle, off-diagonal via
    L x R, no pair double-counted or dropped at block boundaries."""
    expr = _pairs(QUERIES["dedup_embedding_cosine_pairs"](spark, sfdir), "vec_a", "vec_b")
    blas = _pairs(
        QUERIES["dedup_embedding_cosine_pairs_blocked"](spark, sfdir), "vec_a", "vec_b"
    )
    assert blas == expr, (
        f"blocked tier diverged: only_blas={sorted(blas - expr)[:5]} "
        f"only_expr={sorted(expr - blas)[:5]}"
    )


def test_bruteforce_topk_shape(spark, sfdir):
    rows = QUERIES["sim_bruteforce_topk"](spark, sfdir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        ranks = sorted(r.rank for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_media_decode_stub_fails_loudly():
    from psql_streamer_spark.operators.multimodal import decode_media

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present: the real-codec branch is active")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_media_decode_real_codec_when_available():
    """Outside this sandbox the hook decodes real media; in it, Pillow is
    absent and this skips (the stub test above covers that branch)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from psql_streamer_spark.operators.multimodal import decode_media

    buf = io.BytesIO()
    Image.new("RGB", (4, 2)).save(buf, format="PNG")
    feats = decode_media(buf.getvalue(), "image/png")
    assert (feats["width"], feats["height"], feats["format"]) == (4, 2, "PNG")


def test_fake_image_features_deterministic():
    from psql_streamer_spark.operators.multimodal import fake_image_features

    a = fake_image_features(b"hello world")
    b = fake_image_features(b"hello world")
    assert a == b
    assert a[0] == 11 and a[1] == 11 % 640 + 1 and a[2] == (11 * 7) % 480 + 1


def test_connected_components_long_chain(spark):
    """A path graph (diameter n-1) is where plain min-label propagation
    needs ~n rounds; alternating large-star/small-star must label every
    vertex with the chain's minimum in O(log n) passes."""
    from psql_streamer_spark.operators.dedup import connected_components

    n = 12
    vertices = spark.createDataFrame([(i,) for i in range(n + 3)], ["id"])
    # chain 0-1-...-11, plus isolated 12,13,14
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a", "b"])
    got = {
        r.id: r.label
        for r in connected_components(vertices, edges, id_col="id", max_iter=n + 2).collect()
    }
    assert got == {**{i: 0 for i in range(n)}, 12: 12, 13: 13, 14: 14}
    # diameter-bound propagation needed ~11 rounds here; star-contraction
    # halves chain depth per pass (+1 pass to detect the fixpoint)
    assert connected_components.last_rounds <= 5


def test_connected_components_merges_and_reversed_edges(spark):
    """Components that merge through a shared vertex, duplicate and
    reversed edge listings, and a two-cycle all resolve to minima."""
    from psql_streamer_spark.operators.dedup import connected_components

    vertices = spark.createDataFrame([(i,) for i in range(9)], ["id"])
    edges = spark.createDataFrame(
        [(5, 3), (3, 5), (3, 1), (7, 8), (8, 7), (2, 6), (6, 4), (4, 2)],
        ["a", "b"],
    )
    got = {
        r.id: r.label
        for r in connected_components(vertices, edges, id_col="id").collect()
    }
    assert got == {0: 0, 1: 1, 3: 1, 5: 1, 2: 2, 4: 2, 6: 2, 7: 7, 8: 7}


def _cached_rdd_ids(spark) -> set:
    # track SPECIFIC rdd ids: other tests' lingering caches (and their
    # async releases) must not flake these assertions
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_operator_index_caches_bounded_not_accumulating(spark):
    """Cache-lifetime discipline, registry form: an index-building
    operator materializes its index frames ONCE into the bounded
    MaterializedIndexCache — repeat invocations in a long-lived session
    reuse them (no per-call growth in executor storage), and clear()
    releases every entry. This replaces the release-with-result contract:
    rebuilding the LSH index per query threw away the index."""
    import gc
    import time

    from psql_streamer_spark.caching import INDEX_CACHE
    from psql_streamer_spark.operators.dedup import dedup_minhash_lsh_pairs

    def wait_gone(ids: set) -> bool:
        for _ in range(100):  # unpersist is async (blocking=False)
            if not (ids & _cached_rdd_ids(spark)):
                return True
            time.sleep(0.1)
        return False

    INDEX_CACHE.clear()
    gc.collect()
    time.sleep(0.3)
    before = _cached_rdd_ids(spark)
    dedup_minhash_lsh_pairs(spark, SF_SMALL).count()
    created = _cached_rdd_ids(spark) - before
    assert created  # the index frames are materialized and registered
    for _ in range(3):
        dedup_minhash_lsh_pairs(spark, SF_SMALL).count()
    gc.collect()
    time.sleep(0.3)
    assert _cached_rdd_ids(spark) - before == created, (
        "repeat invocations must reuse the registered index, not add caches"
    )
    INDEX_CACHE.clear()
    assert wait_gone(created), "clear() must unpersist every registry entry"


def test_index_cache_lru_evicts_and_unpersists(spark):
    from psql_streamer_spark.caching import MaterializedIndexCache

    cache = MaterializedIndexCache(max_entries=2)
    dfs = []
    for i in range(3):
        df = spark.range(10 + i).persist()
        df.count()
        dfs.append(df)
        got = cache.get_or_build(spark, f"idx{i}", "ds", lambda d=df: d)
        assert got is df
    # idx0 fell off the LRU -> unpersisted; the two newest stay cached
    assert not dfs[0].storageLevel.useMemory
    assert dfs[1].storageLevel.useMemory and dfs[2].storageLevel.useMemory
    # a hit refreshes recency: idx1 survives the next insert, idx2 evicts
    assert cache.get_or_build(spark, "idx1", "ds", lambda: None) is dfs[1]
    df3 = spark.range(20).persist()
    df3.count()
    cache.get_or_build(spark, "idx3", "ds", lambda: df3)
    assert not dfs[2].storageLevel.useMemory
    assert dfs[1].storageLevel.useMemory
    cache.clear()
    assert not dfs[1].storageLevel.useMemory and not df3.storageLevel.useMemory


def test_lsh_band_bucket_cap_guards_boilerplate_skew(spark):
    """Boilerplate-heavy corpus (10%+ identical template docs): every band
    key the template hashes to becomes one hot bucket -> quadratic
    candidates on one reducer. band_bucket_cap must drop the hot buckets
    while small buckets (true near-dup pairs) survive."""
    from psql_streamer_spark.functions.text_hash import (
        doc_shingles,
        h32,
        minhash_agg_columns,
    )
    from psql_streamer_spark.operators.dedup import minhash_lsh_candidates
    from pyspark.sql import functions as F

    boiler = "all work and no play makes jack a dull boy " * 5
    pair_text = "entirely separate near duplicate pair content " * 5
    rows = [(i, boiler) for i in range(40)]  # hot template cluster
    rows += [
        (100 + i, f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(30)))
        for i in range(20)
    ]  # unique docs: no collisions among themselves
    rows += [(200, pair_text), (201, pair_text)]  # small true-dup bucket
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sig = (
        doc_shingles(d)
        .select("doc_id", h32(F.col("shingle")).alias("h"))
        .groupBy("doc_id")
        .agg(*minhash_agg_columns())
    )

    uncapped = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_candidates(sig).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(sig, band_bucket_cap=10).collect()
    }
    boiler_ids = set(range(40))
    # without the cap: the full 40*39/2 template blowup materializes
    assert {(a, b) for (a, b) in uncapped if a in boiler_ids} >= {
        (a, b) for a in range(40) for b in range(a + 1, 40)
    }
    # with the cap: hot buckets gone, the small near-dup bucket survives
    assert (200, 201) in capped
    assert not any(a in boiler_ids and b in boiler_ids for a, b in capped)
    assert len(capped) < 40


def test_kmeans_inertia_decreases_and_is_deterministic(spark, sfdir):
    """Lloyd's invariants: total inertia is non-increasing over rounds
    (each assignment and each centroid update minimizes it), every vector
    is assigned exactly once, and the whole training is a pure function of
    the input (md5-free init from dense vec_ids -> rerun == rerun)."""
    from psql_streamer_spark.operators.similarity import (
        KM_K,
        _vectors,
        kmeans_assignments,
    )

    v = _vectors(spark, sfdir)
    n = v.count()
    inertias = []
    for iters in (1, 2, 4):
        a = kmeans_assignments(v, iters=iters)
        agg = a.agg(F.sum("d2").alias("i"), F.count("*").alias("n")).collect()[0]
        assert agg["n"] == n, "every vector assigned exactly once"
        inertias.append(agg["i"])
    assert inertias[0] >= inertias[1] >= inertias[2], inertias
    # determinism: identical assignment on a fresh plan
    a1 = kmeans_assignments(v).select("vec_id", "cluster_id")
    a2 = kmeans_assignments(v).select("vec_id", "cluster_id")
    assert a1.exceptAll(a2).count() == 0 and a2.exceptAll(a1).count() == 0
    assert a1.select("cluster_id").distinct().count() <= KM_K


def test_semantic_dedup_invariants(spark, sfdir):
    """SemDeDup pipeline invariants, on both centroid sources: every
    vector labeled exactly once, exactly one survivor per near-dup group,
    groups never straddle clusters (pair mining is intra-cluster, so a
    connected component lives inside one cluster), and the survivor is
    the group member least similar to its centroid (paper's rule)."""
    for name in ("dedup_semantic_clusters", "dedup_semantic_clusters_kmeans"):
        rows = QUERIES[name](spark, sfdir).collect()
        n_vectors = len({r.vec_id for r in rows})
        assert len(rows) == n_vectors, f"{name}: duplicate vec labels"
        by_group: dict = {}
        for r in rows:
            by_group.setdefault(r.group_id, []).append(r)
        for gid, members in by_group.items():
            assert sum(m.is_kept for m in members) == 1, f"{name}: group {gid}"
            assert len({m.cluster_id for m in members}) == 1, (
                f"{name}: group {gid} straddles clusters"
            )
            assert all(m.group_size == len(members) for m in members)
        # dedup actually happened OR corpus had no near-dups — either way
        # survivors == groups
        assert sum(r.is_kept for r in rows) == len(by_group)


def test_exact_substring_spans_are_verbatim_and_maximal(spark, sfdir):
    """Every reported span must be a true verbatim token-for-token match
    at the reported offsets, and maximal (extending one token on either
    side breaks the match) — the defining property of suffix-array dedup
    that the gaps-and-islands reconstruction must preserve."""
    from psql_streamer_spark.operators.dedup import SPAN_MIN_TOKENS

    spans = QUERIES["dedup_exact_substring_spans"](spark, sfdir).collect()
    if not spans:
        pytest.skip("no shared spans at this sf")
    docs = {
        r.doc_id: [w for w in r.text.lower().split() if w]
        for r in spark.read.parquet(f"{sfdir}/documents.parquet").collect()
    }
    for r in spans:
        a, b = docs[r.doc_a], docs[r.doc_b]
        sa, sb, n = int(r.start_a) - 1, int(r.start_b) - 1, int(r.span_tokens)
        assert n >= SPAN_MIN_TOKENS
        assert a[sa : sa + n] == b[sb : sb + n], (r, "not verbatim")
        # maximality: the span cannot extend in either direction
        if sa > 0 and sb > 0:
            assert a[sa - 1] != b[sb - 1], (r, "extends left")
        if sa + n < len(a) and sb + n < len(b):
            assert a[sa + n] != b[sb + n], (r, "extends right")


def test_incremental_lsh_is_exactly_the_delta_touching_slice(spark, sfdir):
    """The incremental miner must return precisely the full-run pairs that
    touch the delta bucket — nothing dropped (a delta-corpus collision
    skipped = a missed duplicate shipped to training), nothing extra."""
    from psql_streamer_spark.operators.dedup import (
        DELTA_BUCKET,
        DELTA_BUCKETS,
        dedup_incremental_lsh_pairs,
        dedup_minhash_lsh_pairs,
    )
    from psql_streamer_spark.operators.mlprep import md5_bucket

    full = dedup_minhash_lsh_pairs(spark, sfdir)
    is_new = lambda c: md5_bucket(F.col(c), DELTA_BUCKETS) == DELTA_BUCKET  # noqa: E731
    expected = full.filter(is_new("doc_a") | is_new("doc_b")).select("doc_a", "doc_b")
    got = dedup_incremental_lsh_pairs(spark, sfdir).select("doc_a", "doc_b")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_cluster_atomic_split_never_straddles_near_dup_pairs(spark):
    """The property split_cluster_atomic exists for: every mined near-dup
    pair has both endpoints in the same split (else the test set leaks
    near-copies of training documents)."""
    from psql_streamer_spark.operators.dedup import dedup_minhash_lsh_pairs
    from psql_streamer_spark.operators.mlprep import split_cluster_atomic

    splits = split_cluster_atomic(spark, SF_SMALL)
    pairs = dedup_minhash_lsh_pairs(spark, SF_SMALL)
    j = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        ).join(
            splits.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
    )
    assert j.filter(F.col("sa") != F.col("sb")).count() == 0
    # and the split covers every document exactly once
    from psql_streamer_spark.sources.tables import load_table

    n_docs = load_table(spark, "documents", SF_SMALL).count()
    assert splits.count() == n_docs
    assert splits.select("doc_id").distinct().count() == n_docs


def test_emb_pair_planes_matches_oracle_case_chain():
    """The Spark side computes p in Python; the oracle computes it with a
    SQL CASE chain over integer comparisons. Pin that BOTH derivations
    are the same function — smallest t in [4, 12] with 2^t >= ceil(N/250)
    — across the boundaries where a float-log2 formulation could diverge
    by one ulp (exact multiples of 250, exact powers of two)."""
    from psql_streamer_spark.operators.dedup import (
        EMB_PAIR_BUCKET,
        EMB_PAIR_MAX_PLANES,
        EMB_PAIR_MIN_PLANES,
        _emb_pair_planes,
    )

    def sql_case(n: int) -> int:
        m = (n + EMB_PAIR_BUCKET - 1) // EMB_PAIR_BUCKET
        for t in range(EMB_PAIR_MIN_PLANES, EMB_PAIR_MAX_PLANES):
            if m <= (1 << t):
                return t
        return EMB_PAIR_MAX_PLANES

    boundary = [1, 2, 199, 200, 2000, 20000, 60000]
    for k in range(4, 13):
        c = 250 * (1 << k)
        boundary += [c - 1, c, c + 1]
    for n in boundary:
        assert _emb_pair_planes(n) == sql_case(n), n
    # clamps
    assert _emb_pair_planes(1) == EMB_PAIR_MIN_PLANES
    assert _emb_pair_planes(10**9) == EMB_PAIR_MAX_PLANES


def test_plane_signs_match_sql_derivation():
    """The plan-time literal sign arrays must reproduce the oracle's
    per-row md5 derivation exactly: parity of the first hex nibble of
    md5('rp:t:j:i')."""
    import hashlib as _hl

    from psql_streamer_spark.operators.similarity import _plane_signs

    for t in (0, 3):
        for j in (0, 11):
            signs = _plane_signs(t, j, 64)
            for i in (0, 1, 31, 63):
                nib = int(_hl.md5(f"rp:{t}:{j}:{i}".encode()).hexdigest()[0], 16)
                assert signs[i] == (1.0 if nib % 2 == 0 else -1.0)


def test_sqrt_stride_floor_preserves_small_sf_behavior(spark):
    """max(50, ceil(sqrt(N))): the floor keeps every oracle-checked SF on
    the original stride-50 centroid set (sqrt kicks in only past 2500
    rows), and isqrt(n-1)+1 == ceil(sqrt(n)) including perfect squares."""
    import math

    for n, want in [(0, 50), (1, 50), (2500, 50), (2501, 51), (10000, 100), (10001, 101)]:
        got = max(50, math.isqrt(max(0, n - 1)) + 1)
        assert got == want, (n, got, want)


def test_simhash64_band_pigeonhole_and_half_range(spark, sfdir):
    """64-bit tier invariants: signature halves fit 32 unsigned bits
    (never negative — a signed overflow would corrupt banding in either
    engine), and every emitted pair agrees exactly on at least one 16-bit
    band — the pigeonhole property the 4x16 banding is built on (a pair
    that disagrees on all 4 bands has hamming >= 4 and must not appear)."""
    sig = {
        r.doc_id: (r.sh_lo, r.sh_hi)
        for r in QUERIES["dedup_simhash64_signatures"](spark, sfdir).collect()
    }
    assert sig, "empty signature frame"
    for lo, hi in sig.values():
        assert 0 <= lo < 1 << 32 and 0 <= hi < 1 << 32

    def bands(lo, hi):
        return [(lo >> 0) & 0xFFFF, (lo >> 16) & 0xFFFF,
                (hi >> 0) & 0xFFFF, (hi >> 16) & 0xFFFF]

    pairs = QUERIES["dedup_simhash64_pairs"](spark, sfdir).collect()
    for r in pairs:
        la, ha = sig[r.doc_a]
        lb, hb = sig[r.doc_b]
        ham = bin(la ^ lb).count("1") + bin(ha ^ hb).count("1")
        assert ham == r.hamming <= 3
        assert any(x == y for x, y in zip(bands(la, ha), bands(lb, hb)))


def test_simhash64_banded_pairs_rejects_invalid_bands(spark, sfdir):
    """r12 (ADVICE): bands=0 must raise the descriptive ValueError, not a
    ZeroDivisionError — `bands % 2` is falsy for 0, so short-circuit
    evaluation used to reach `32 % per_half` with per_half=0. Odd and
    non-divisor band counts keep raising too."""
    import pytest

    from psql_streamer_spark.operators.dedup import simhash64_banded_pairs

    for bad in (0, -2, 3, 6):
        with pytest.raises(ValueError, match="bands must split"):
            simhash64_banded_pairs(spark, sfdir, bands=bad)


def test_exact_substring_cap_drops_boilerplate_keeps_organic(spark, tmp_path):
    """The df-cap tier must kill the quadratic boilerplate blow-up (30
    identical docs -> C(30,2)=435 span rows uncapped) while organic
    low-frequency spans survive verbatim — the exact trade the capped
    production registration promises."""
    from psql_streamer_spark.operators.dedup import dedup_exact_substring_spans

    boiler = " ".join(f"lic{i}" for i in range(40))
    organic = " ".join(f"org{i}" for i in range(30))
    rows = [(i, boiler) for i in range(30)]
    rows += [(100, "prefixa " * 3 + organic), (101, "prefixb " * 5 + organic)]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )

    uncapped = dedup_exact_substring_spans(spark, sf).collect()
    assert len(uncapped) == 30 * 29 // 2 + 1  # boilerplate blowup + organic
    capped = dedup_exact_substring_spans(spark, sf, doc_freq_cap=8).collect()
    assert [(r.doc_a, r.doc_b, r.span_tokens) for r in capped] == [(100, 101, 30)]


def test_dedup_quality_report_floors_at_sf01(spark):
    """The registered dedup quality report (hash-checked vs DuckDB at
    sf0.01) must clear documented floors at sf0.1 — measured exact
    values: minhash_lsh recall 1.0 / precision 1.0 (its exact-Jaccard
    verify makes precision 1.0 BY CONSTRUCTION; the report proves it),
    simhash recall 0.8398 / precision 0.9188, simhash64 recall 0.4570 /
    precision 1.0000 (hamming<=3 over 64 bits is a much stricter
    relative bound — high purity, lower coverage), simhash64_wide
    (the r11 recall knob: 8x8 banding, hamming<=7) recall 0.8828 /
    precision 1.0000 — the wide class recovers the recall the narrow
    one forfeits while keeping perfect purity on this corpus, at 256x
    the candidate density (QUALITY_r11). Floors sit below with margin
    so a banding-knob change that collapses quality fails here."""
    rows = {
        r.tier: r
        for r in QUERIES["dedup_quality_report"](
            spark, "/root/testdata/sf0.1"
        ).collect()
    }
    assert set(rows) == {"minhash_lsh", "simhash", "simhash64", "simhash64_wide"}
    mh, sh, sh64 = rows["minhash_lsh"], rows["simhash"], rows["simhash64"]
    sh64w = rows["simhash64_wide"]
    assert mh.precision == 1.0  # exact, by construction — not a floor
    assert mh.recall >= 0.9
    assert sh.recall >= 0.7 and sh.precision >= 0.85
    assert sh64.recall >= 0.35 and sh64.precision >= 0.95
    assert sh64w.recall >= 0.8 and sh64w.precision >= 0.95
    # the knob's whole point: wide recall must strictly beat narrow
    assert sh64w.recall > sh64.recall
    for r in rows.values():
        assert r.n_hits <= r.n_truth and r.n_hits <= r.n_pairs


def test_langid_nb_separates_planted_character_distributions(spark, tmp_path):
    """The trained char-bigram NB must recover language identity when the
    corpus actually HAS character-level signal (distinct alphabets per
    lang) — including a language the marker heuristic cannot name — and
    its Spark scores must match the DuckDB oracle replay exactly. (On the
    driver's synthetic corpus the labels carry no lexical signal, so both
    classifiers sit at the majority class — text_langid_model_confusion
    records that honestly; THIS test proves the operator itself.)"""
    import duckdb

    from psql_streamer_spark.operators.text import (
        _SQL_LANGID_NB,
        _langid_nb_scores,
    )

    rows = []
    did = 0
    for rep in range(6):
        did += 1
        rows.append((did, f"abba bacada adaba cabbage bad{rep}", "aa", "s1", 30))
        did += 1
        rows.append((did, f"zyxw wxyz yzzy xyzzy wuzzy wuz{rep}", "zz", "s1", 30))
    corpus = str(tmp_path / "langs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{corpus}/documents.parquet")

    got = {
        r.doc_id: (r.labeled_lang, r.predicted_lang, r.cost_bits)
        for r in _langid_nb_scores(spark, corpus).collect()
    }
    # perfect separation on disjoint alphabets
    for doc_id, (lab, pred, _) in got.items():
        assert pred == lab, (doc_id, lab, pred)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus}/documents.parquet/*.parquet')"
    )
    want = {
        int(d): (lab, pred, int(cb))
        for d, lab, pred, cb in con.execute(
            _SQL_LANGID_NB
            + "SELECT doc_id, labeled_lang, cand_lang, cost_bits"
            " FROM nb_best WHERE rn = 1"
        ).fetchall()
    }
    assert got == want  # whole-bit costs identical across engines


def test_with_words_owned_column_contract(spark):
    """`__words` is an OWNED derived column (with_words' CONTRACT, advice
    item r15): the default fast path serves cached tokens, drop_words
    invalidates them after a text rewrite, and fresh=True forces
    re-tokenization through the cache."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.functions.text_hash import (
        drop_words,
        with_words,
    )

    d = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    tok = with_words(d)
    # fast path: already-tokenized frame passes through unchanged
    assert with_words(tok) is tok
    # a text rewrite WITHOUT invalidation would serve stale tokens —
    # drop_words is the contract-mandated invalidation
    rewritten = tok.withColumn("text", F.lit("gamma"))
    stale = with_words(rewritten).head()["__words"]
    assert stale == ["alpha", "beta"]  # the documented hazard, pinned
    assert with_words(drop_words(rewritten)).head()["__words"] == ["gamma"]
    assert with_words(rewritten, fresh=True).head()["__words"] == ["gamma"]
    # drop_words on an untokenized frame is a no-op passthrough
    assert drop_words(d) is d


def test_exact_incremental_dup_and_novel_paths(spark):
    """dedup_exact_incremental's semantics on a planted frame (the
    synthetic corpora contain no cross-boundary byte copies, so the dup
    path never fires on real data): a delta doc byte-identical to prior
    copies reports their count and the EARLIEST prior id as canonical; a
    novel delta doc reports (NULL, 0); prior-only dups and delta-delta
    copies are out of scope (prior state and same-day granularity
    respectively)."""
    from pyspark.sql import functions as F

    from psql_streamer_spark.operators.dedup import (
        exact_incremental_verdicts,
    )

    rows = [
        (1, "alpha beta gamma"),   # prior copy (earliest)
        (2, "alpha beta gamma"),   # prior copy
        (3, "unique prior text"),
        (101, "alpha beta gamma"),  # delta: dup of 1 and 2
        (102, "novel arrival"),     # delta: novel
        (103, "novel arrival"),     # delta: delta-delta copy — still novel
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.new_doc_id: (r.canonical_doc_id, r.n_prior_copies)
        for r in exact_incremental_verdicts(
            d, F.col("doc_id") >= 100
        ).collect()
    }
    assert got == {101: (1, 2), 102: (None, 0), 103: (None, 0)}


def test_extract_features_batch_matches_scalar_reference():
    """r16: the vectorized Arrow-batch feature extractor must agree
    row-for-row with fake_image_features (the single-payload reference),
    including NULL payloads."""
    import pandas as pd

    from psql_streamer_spark.operators.multimodal import (
        _extract_features,
        fake_image_features,
    )

    payloads = [b"hello world", b"", b"\x00\xffbinary blob" * 37, None, b"x"]
    pdf = pd.DataFrame(
        {"doc_id": list(range(len(payloads))), "payload": payloads}
    )
    (out,) = list(_extract_features(iter([pdf])))
    for i, p in enumerate(payloads):
        n, w, h, ck = fake_image_features(p)
        row = out.iloc[i]
        if p is None:
            assert pd.isna(row.n_bytes) and pd.isna(row.n_pixels)
            assert row.checksum is None
        else:
            assert (row.n_bytes, row.width, row.height) == (n, w, h)
            assert row.n_pixels == w * h
            assert row.checksum == ck
