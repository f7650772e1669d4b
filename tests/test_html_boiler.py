"""HTML extraction + line-level boilerplate removal: semantic pins
(strip-then-decode ordering, chrome dropped, document order kept) and the
scale plan guards (extract is shuffle-free; boilerplate has exactly the
line-df shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from psql_streamer_spark.operators.text import (
    _BOILER_FOOT,
    _BOILER_NAV,
    text_boilerplate_lines,
    text_html_extract,
)
from tests.conftest import SF_SMALL


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_html_extract_strips_then_decodes(spark):
    from psql_streamer_spark.sources.tables import load_table

    rows = {r.doc_id: r for r in text_html_extract(spark, SF_SMALL).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, "documents", SF_SMALL).collect()}
    assert rows.keys() == docs.keys()
    some = next(iter(rows.values()))
    # script/style payloads never leak into clean text
    assert "track(" not in some.clean_text
    assert "color:#00f" not in some.clean_text
    # the synthesized page has >= the fixed chrome tags and 3 nav links
    assert some.n_links == 3
    assert some.n_tags >= 20
    # entity decoding happened AFTER stripping: a doc containing ' a '
    # yields a literal '<a>' in the clean text (it was '&lt;a&gt;' while
    # tags were being stripped)
    for doc_id, text in docs.items():
        if " a " in text:
            assert "<a>" in rows[doc_id].clean_text
            break
    else:
        raise AssertionError("no doc exercised the entity path at this sf")
    # title/heading text survives extraction
    assert some.clean_text.startswith("Doc ")
    assert len(some.clean_text) == some.n_chars_clean


def test_boilerplate_drops_chrome_keeps_content_in_order(spark):
    from psql_streamer_spark.functions.text_hash import with_words
    from psql_streamer_spark.sources.tables import load_table

    got = {r.doc_id: r for r in text_boilerplate_lines(spark, SF_SMALL).collect()}
    d = with_words(load_table(spark, "documents", SF_SMALL))
    words = {
        r.doc_id: list(r["__words"])
        for r in d.select("doc_id", "__words").collect()
    }
    assert got.keys() == words.keys()
    for doc_id, r in got.items():
        # every doc synthesized nav + footer; both are chrome (df ~ 100%
        # of docs AND pattern-matched) so neither survives
        assert _BOILER_NAV not in r.clean_text
        assert "all rights reserved" not in r.clean_text
        n_chunks = (len(words[doc_id]) + 7) // 8
        assert r.n_lines == n_chunks + 2
        assert r.n_kept + r.n_dropped_df + r.n_dropped_pattern == r.n_lines
        # kept lines reassemble in original word order
        kept_words = [w for line in r.clean_text.split("\n") if line for w in line.split(" ")]
        dropped_content = [
            words[doc_id][i * 8 : (i + 1) * 8]
            for i in range(n_chunks)
        ]
        surviving = [
            w
            for chunk in dropped_content
            if " ".join(chunk) in r.clean_text.split("\n")
            for w in chunk
        ]
        assert kept_words == surviving


def test_html_extract_plan_is_narrow(spark):
    plan = _physical(text_html_extract(spark, SF_SMALL))
    assert "Exchange" not in plan  # shuffle-free: runs at scan speed
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_boilerplate_plan_shuffles_only_on_lines(spark):
    plan = _physical(text_boilerplate_lines(spark, SF_SMALL))
    # the ndocs scalar must ride in as a broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
