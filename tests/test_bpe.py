"""Trained-BPE tokenizer: training parity vs a pure-Python reference,
encode-path equivalence (join path == merge-fold path), and the scale plan
guard (encode is a broadcast join, training never touches the corpus after
the word-count pass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from psql_streamer_spark.operators.text import (
    BPE_N_MERGES,
    _bpe_train,
    bpe_encode_pieces_udf,
    text_bpe_encode_tokens,
)
from tests.conftest import SF_SMALL


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook Sennrich BPE on a word-frequency table: most-frequent
    adjacent pair, ties to the lexicographically smallest (left, right),
    leftmost non-overlapping application."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, pieces in vocab.items():
            for i in range(len(pieces) - 1):
                pair = (pieces[i], pieces[i + 1])
                pc[pair] = pc.get(pair, 0) + word_counts[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        for w, pieces in vocab.items():
            out = [pieces[0]]
            for x in pieces[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_python_reference(spark):
    from psql_streamer_spark.functions.text_hash import with_words
    from psql_streamer_spark.sources.tables import load_table

    wc = {
        r.word: r.cnt
        for r in with_words(load_table(spark, "documents", SF_SMALL))
        .select(F.explode("__words").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    want_merges, want_vocab = _reference_bpe(wc, BPE_N_MERGES)

    merges, words = _bpe_train(spark, SF_SMALL)
    assert merges == want_merges
    got_vocab = {r.word: list(r.pieces) for r in words.collect()}
    assert got_vocab == want_vocab


def test_bpe_encode_udf_matches_training_segmentation(spark):
    # in-vocab: the rank-ordered merge fold must land on exactly the
    # segmentation the training loop left behind (this is the invariant
    # that makes the join path a valid encoder)
    merges, words = _bpe_train(spark, SF_SMALL)
    enc = bpe_encode_pieces_udf(merges)
    rows = words.select("word", "pieces", enc("word").alias("enc")).collect()
    assert rows
    for r in rows:
        assert list(r.enc) == list(r.pieces), r.word


def test_bpe_encode_udf_handles_oov_and_overlaps(spark):
    # frozen-model semantics on words the training never saw, including
    # the self-overlapping pair: leftmost non-overlapping application
    merges = [(0, "a", "a", "aa", 9), (1, "aa", "b", "aab", 5)]
    enc = bpe_encode_pieces_udf(merges)
    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("aab",), ("xaaby",), ("q",)], "w string"
    )
    got = {r.w: list(r.out) for r in df.select("w", enc("w").alias("out")).collect()}
    assert got == {
        "aaa": ["aa", "a"],
        "aaaa": ["aa", "aa"],
        "aab": ["aab"],
        "xaaby": ["x", "aab", "y"],
        "q": ["q"],
    }


def test_bpe_encode_plan_is_one_broadcast_join(spark):
    # the 100 TB contract: corpus-side encoding is a broadcast hash join
    # against the Heaps-bounded vocab — no shuffle join, no Python in the
    # corpus scan
    plan = (
        text_bpe_encode_tokens(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_token_counts_conserve_words(spark):
    # every word encodes to >= 1 piece and <= len(word) pieces; totals per
    # doc must respect both bounds
    df = text_bpe_encode_tokens(spark, SF_SMALL)
    bad = df.filter(
        (F.col("n_bpe_tokens") < F.col("n_words"))
        | (F.col("bpe_tokens_per_word") < 1.0)
    ).count()
    assert bad == 0
    assert df.count() > 0


def test_bpe_packing_places_every_doc_contiguously(spark):
    from psql_streamer_spark.operators.mlprep import (
        PACK_BUDGET_TOKENS,
        mlprep_pack_sequences_bpe,
    )
    from psql_streamer_spark.sources.tables import load_table

    packed = mlprep_pack_sequences_bpe(spark, SF_SMALL).collect()
    n_docs = load_table(spark, "documents", SF_SMALL).count()
    assert len(packed) == n_docs  # zero-token docs pack too, never drop
    by_source: dict[str, list] = {}
    for r in packed:
        by_source.setdefault(r.source, []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.pack_id == cum // PACK_BUDGET_TOKENS  # contiguous fill
            assert r.n_tokens >= 0
            cum += r.n_tokens


def test_compression_report_bounds(spark):
    from psql_streamer_spark.operators.text import text_bpe_compression_report

    rows = text_bpe_compression_report(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1.0 <= r.tokens_per_word  # every word >= 1 token
        assert r.chars_per_token >= 1.0  # every token >= 1 char
        assert r.n_bpe_tokens >= r.n_words
        assert r.n_word_chars >= r.n_bpe_tokens  # tokens never exceed chars


def test_oov_fallback_exercises_both_paths(spark):
    from psql_streamer_spark.operators.text import (
        BPE_VOCAB_CAP,
        _bpe_train,
        bpe_encode_pieces_udf,
        text_bpe_encode_oov_fallback,
    )

    df = text_bpe_encode_oov_fallback(spark, SF_SMALL)
    agg = df.agg(
        F.sum("n_invocab_words").alias("iv"),
        F.sum("n_oov_words").alias("oov"),
        F.sum("n_words").alias("nw"),
        F.sum("n_bpe_tokens").alias("nt"),
    ).head()
    # the cap is below the corpus vocab, so BOTH paths must carry words
    assert agg.iv > 0 and agg.oov > 0
    assert agg.iv + agg.oov == agg.nw
    assert agg.nt >= agg.nw
    # the capped model really is capped
    merges, words = _bpe_train(spark, SF_SMALL, vocab_cap=BPE_VOCAB_CAP)
    assert words.count() == BPE_VOCAB_CAP
    # and the UDF the OOV path runs agrees with the uncapped invariant:
    # encoding an in-vocab word reproduces its training segmentation
    enc = bpe_encode_pieces_udf(merges)
    for r in words.select("word", "pieces", enc("word").alias("e")).collect():
        assert list(r.e) == list(r.pieces)
