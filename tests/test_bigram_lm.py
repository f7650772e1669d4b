"""Bigram-LM surprisal: the order-sensitivity property that justifies the
tier (unigram scoring cannot see word order), plus chain-rule accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from psql_streamer_spark.operators.text import (
    text_bigram_surprisal,
    text_unigram_surprisal,
)


def _corpus(spark, tmp_path):
    ordered = ("alpha beta gamma delta " * 5).strip()
    words = ordered.split(" ")
    # fixed derangement-ish shuffle: same multiset, broken bigrams
    shuffled = " ".join(words[::2] + words[1::2])
    rows = [(i, ordered, "xx", "src1", len(ordered)) for i in range(20)]
    rows.append((99, shuffled, "xx", "src1", len(shuffled)))
    out = str(tmp_path / "lmcorpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_bigram_sees_word_order_unigram_cannot(spark, tmp_path):
    corpus = _corpus(spark, tmp_path)
    uni = {r.doc_id: r.avg_centibits for r in text_unigram_surprisal(spark, corpus).collect()}
    big = {r.doc_id: r.avg_centibits for r in text_bigram_surprisal(spark, corpus).collect()}
    # same token multiset => identical unigram score
    assert uni[99] == uni[0]
    # broken ordering => strictly more bigram bits
    assert big[99] > big[0], (big[99], big[0])


def test_bigram_chain_rule_accounting(spark, tmp_path):
    corpus = _corpus(spark, tmp_path)
    df = text_bigram_surprisal(spark, corpus)
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == 21
    for r in rows.values():
        assert r.total_bits >= 0
        assert r.avg_centibits == r.total_bits * 100 // r.n_tokens
    # the fully-templated docs are near-zero surprisal under their own LM
    assert rows[0].avg_centibits < rows[99].avg_centibits
