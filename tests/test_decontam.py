"""Decontamination operators: embedding-cosine (semantic) screening and the
Bloom-filter n-gram scale path.

Pins the two properties that make each operator trustworthy: the Bloom
filter can NEVER produce a false negative (every exact eval-gram hit must
bloom-hit — the guarantee downstream quarantine logic relies on), and its
bitmap construction + probe must agree bit-for-bit with an independent
Python reimplementation of the md5 position math (cross-implementation
determinism — the same property the DuckDB oracle checks relationally).
Plan shapes are asserted too: the bloom probe must stay a pure JVM
expression (no Python eval, no join for the bloom column), the exact
column's join must broadcast, and the embedding screen's eval side must
broadcast rather than shuffle."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from psql_streamer_spark.operators import mlprep
from psql_streamer_spark.operators.mlprep import (
    BLOOM_K_HASHES,
    BLOOM_M_BITS,
    DECONTAM_EVAL_SOURCE,
    DECONTAM_K,
    EMBED_DECONTAM_LABEL,
    EMBED_DECONTAM_THRESHOLD,
    _bloom_probe,
    _eval_bloom_positions,
    bloom_words_df,
    build_bloom_words,
    decontaminate_bloom_ngrams,
    decontaminate_embedding_cosine,
)

SF_DIR = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _py_position(gram: str, seed: int, m_bits: int = BLOOM_M_BITS) -> int:
    """Independent Python twin of mlprep._bloom_position."""
    h = hashlib.md5(f"{seed}|{gram}".encode()).hexdigest()
    return int(h[:8], 16) % m_bits


def _probe_frame(spark, corpus, words, m_bits=BLOOM_M_BITS):
    return (
        corpus.crossJoin(F.broadcast(bloom_words_df(spark, words)))
        .withColumn(
            "bloom_hit", _bloom_probe(F.col("g"), F.col("____bloom_words"), m_bits)
        )
        .drop("____bloom_words")
    )


def _corpus_and_bench_grams(spark):
    from psql_streamer_spark.functions.text_hash import shingles_expr, with_words
    from psql_streamer_spark.sources.tables import load_table

    d = with_words(load_table(spark, "documents", SF_DIR))
    grams = shingles_expr(F.col("__words"), k=DECONTAM_K)
    corpus = (
        d.filter(F.col("source") != DECONTAM_EVAL_SOURCE)
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    bench = (
        d.filter(F.col("source") == DECONTAM_EVAL_SOURCE)
        .select(F.explode(grams).alias("g"))
        .distinct()
    )
    return corpus, bench


def test_bloom_has_no_false_negatives_at_gram_level(spark):
    # every gram that exactly matches an eval gram MUST bloom-hit — the
    # defining Bloom guarantee, asserted at gram granularity (stronger
    # than the per-doc count inequality it implies)
    words = build_bloom_words(_eval_bloom_positions(spark, SF_DIR))
    corpus, bench = _corpus_and_bench_grams(spark)
    probed = _probe_frame(spark, corpus, words).join(
        F.broadcast(bench.withColumnRenamed("g", "bg")),
        F.col("g") == F.col("bg"),
        "left",
    )
    violations = probed.filter(
        F.col("bg").isNotNull() & ~F.col("bloom_hit")
    ).count()
    assert violations == 0


def test_bloom_per_doc_counts_respect_the_guarantee(spark):
    rows = decontaminate_bloom_ngrams(spark, SF_DIR).collect()
    assert rows, "corpus produced no documents"
    for r in rows:
        assert r.n_bloom_hits >= r.n_exact_hits, r
        assert r.n_grams >= r.n_bloom_hits, r


def test_bloom_bitmap_and_probe_match_python_reference(spark):
    # cross-implementation determinism: the Spark-side hex bitmap and the
    # JVM probe expression must reproduce an independent hashlib-based
    # Python bloom verdict for every corpus gram
    positions = set(_eval_bloom_positions(spark, SF_DIR))
    words = build_bloom_words(positions)
    corpus, bench = _corpus_and_bench_grams(spark)
    bench_set = {r.g for r in bench.collect()}
    # the word array must encode exactly the positions set, no more bits
    set_bits = {
        i * 64 + b
        for i, w in enumerate(words)
        for b in range(64)
        if (w & ((1 << 64) - 1)) >> b & 1
    }
    assert set_bits == positions
    # position math parity: eval grams hashed in Python land on the same bits
    py_pos = {
        _py_position(g, s) for g in bench_set for s in range(BLOOM_K_HASHES)
    }
    assert py_pos == positions
    # probe parity over the full corpus gram stream
    probed = _probe_frame(spark, corpus, words).collect()
    for r in probed:
        expected = all(
            _py_position(r.g, s) in positions for s in range(BLOOM_K_HASHES)
        )
        assert r.bloom_hit == expected, (r.g, r.bloom_hit, expected)


def test_bloom_probe_plan_is_jvm_only_with_broadcast_exact_join(spark):
    plan = _physical(decontaminate_bloom_ngrams(spark, SF_DIR))
    # bloom column = pure expression; exact column = broadcast gram join;
    # nothing falls back to Python eval or a cartesian product
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_decontam_flags_match_threshold_and_scope(spark):
    from psql_streamer_spark.sources.tables import load_table

    df = decontaminate_embedding_cosine(spark, SF_DIR)
    rows = df.collect()
    n_corpus = (
        load_table(spark, "embeddings", SF_DIR)
        .filter(F.col("label") != EMBED_DECONTAM_LABEL)
        .count()
    )
    # one verdict per corpus vector, eval vectors excluded
    assert len(rows) == n_corpus
    for r in rows:
        assert -1.0 - 1e-9 <= r.max_cosine <= 1.0 + 1e-9
        assert r.contaminated == (r.max_cosine >= EMBED_DECONTAM_THRESHOLD)


def test_embedding_decontam_is_join_free_vectorized_scan(spark):
    plan = _physical(decontaminate_embedding_cosine(spark, SF_DIR))
    # r17: the |corpus| x |battery| pair rows are never materialized —
    # the NumPy column fold inside MapInPandas reduces each corpus
    # vector against the driver-collected battery in one pass, so the
    # plan is a single corpus scan feeding Python, with no join, no
    # cartesian, and no exchange at all
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange" not in plan


def test_embedding_decontam_null_lake_oracle_parity(spark, tmp_path):
    """NULL-semantics parity of the r17 mapInPandas rewrite against the
    DuckDB oracle on a dirtied lake: NULL battery embeddings contribute
    nothing to the max (but keep the battery non-empty), NULL corpus
    embeddings yield a row with NULL max_cosine, NULL labels drop out of
    both sides — exactly the legacy crossJoin + fold + max semantics."""
    import duckdb

    from psql_streamer_spark.operators.mlprep import _SQL_EMBED_DECONTAM
    from tools.oracle_check import compare

    d = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    con.execute(
        f"""COPY (SELECT vec_id,
                 CASE WHEN vec_id % 2 = 0 THEN NULL ELSE embedding END AS embedding,
                 CASE WHEN vec_id % 3 = 0 THEN NULL ELSE label END AS label
          FROM src) TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    sdf = decontaminate_embedding_cosine(spark, d)
    odf = con.execute(_SQL_EMBED_DECONTAM).fetchdf()
    problems = compare("decontaminate_embedding_cosine[null-lake]", sdf, odf)
    assert not problems, problems


def test_bloom_position_constants_are_sane():
    # the word array must encode exactly BLOOM_M_BITS bits, and the
    # module constants the oracle SQL embeds must match the Python side
    assert BLOOM_M_BITS % 64 == 0
    assert len(build_bloom_words([])) == BLOOM_M_BITS // 64
    # signed-wrap round-trip: bit 63 of word 0 must survive array<bigint>
    w = build_bloom_words([63])
    assert w[0] == -(1 << 63)
    assert str(BLOOM_M_BITS) in mlprep._SQL_BLOOM_DECONTAM
    # the oracle's seed VALUES list is generated from BLOOM_K_HASHES and
    # _sql_bloom_position takes m_bits — retuning either constant cannot
    # desync the two sides
    values = ", ".join(f"({s})" for s in range(BLOOM_K_HASHES))
    assert f"VALUES {values}" in mlprep._SQL_BLOOM_DECONTAM
    assert mlprep._sql_bloom_position("g", 0, m_bits=128).endswith("% 128")
    assert mlprep._sql_bloom_position("g", 0).endswith(f"% {BLOOM_M_BITS}")


def test_bloom_sizing_rule_and_parameterized_probe(spark):
    # bloom_m_bits_for implements the ~16-bits-per-gram rule the fixed-m
    # saturation measurement motivates (DECONTAM_r12.json: 115k grams into
    # 2^16 bits set 99.5% of the filter and the FP rate collapsed the
    # screen); the parameterized machinery must stay verdict-consistent:
    # a right-sized bitmap keeps the no-false-negative guarantee
    from psql_streamer_spark.operators.mlprep import (
        _bloom_position,
        bloom_m_bits_for,
    )

    assert bloom_m_bits_for(1047) == 32768  # sf0.01 battery
    assert bloom_m_bits_for(115605) == 2097152  # the saturating sf1 battery
    assert bloom_m_bits_for(0) == 4096  # floor

    m = 4096
    positions = set(_eval_bloom_positions(spark, SF_DIR, m))
    assert positions and max(positions) < m
    words = build_bloom_words(positions, m)
    assert len(words) == m // 64
    corpus, bench = _corpus_and_bench_grams(spark)
    probed = _probe_frame(spark, corpus, words, m).join(
        F.broadcast(bench.withColumnRenamed("g", "bg")),
        F.col("g") == F.col("bg"),
        "left",
    )
    assert probed.filter(F.col("bg").isNotNull() & ~F.col("bloom_hit")).count() == 0
    # and the position math itself respects the modulus
    sample = [r.g for r in bench.limit(5).collect()]
    for g in sample:
        h = hashlib.md5(f"0|{g}".encode()).hexdigest()
        assert int(h[:8], 16) % m in positions
