"""Cross-engine deterministic text hashing: shingles, h32, MinHash, SimHash.

Everything here must produce the SAME numbers in Spark and DuckDB so the
oracle can replay it. The shared primitive is ``h32(s)`` = first 8 hex
chars of md5(s) parsed as an unsigned 32-bit integer:

- Spark:  CAST(conv(substr(md5(s),1,8), 16, 10) AS BIGINT)
- DuckDB: CAST('0x' || substr(md5(s),1,8) AS BIGINT)

MinHash permutations are (a_j * h + b_j) mod P with P = 2^31-1 and fixed
a/b constants (seeded once, hardcoded below): a_j < 2^20 keeps the product
under 2^52 — no 64-bit overflow in either engine (Spark runs ANSI mode,
which would throw on overflow rather than wrap).

All of it is pure column expressions — JVM codegen in Spark, no UDFs.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
NUM_PERM = 16
LSH_BANDS = 4
LSH_ROWS = NUM_PERM // LSH_BANDS

_rng = random.Random(42)
# (a, b) pairs; a odd so the map is a bijection mod 2^32 inputs
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 20) | 1, _rng.randrange(0, 1 << 20))
    for _ in range(NUM_PERM)
]

SIMHASH_BITS = 32


# -- Spark side -------------------------------------------------------------
def h32(col: Column) -> Column:
    """Deterministic 32-bit hash of a string column (same in DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def words_expr(text_col: str = "text") -> Column:
    """Whitespace tokens, lowercased. The corpus is single-space separated;
    filter() guards against empty tokens from irregular spacing anyway."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0
    )


def with_words(
    df: DataFrame, text_col: str = "text", fresh: bool = False
) -> DataFrame:
    """Materialize the token array into a `__words` column BEFORE handing
    it to shingles_expr.

    Load-bearing performance rule: shingles_expr references its input
    from inside a transform lambda (k element_at calls PER SHINGLE), and
    Catalyst does not common-subexpression-eliminate inside lambda
    functions — passing the raw words_expr() inline re-tokenizes
    (lower+split+filter) the document for every element_at, an
    O(words * k) blow-up of the tokenize cost. Measured at sf0.1: the
    shingle explode drops 13.1 s -> 0.6 s once words are a projected
    attribute (computed once per row; CollapseProject keeps multiply-
    referenced non-cheap aliases materialized).

    Idempotent for the DEFAULT column: a frame that already carries
    `__words` passes through unchanged — this is what lets the fused
    ingest gate tokenize a micro-batch ONCE (and persist it) while every
    downstream probe keeps calling with_words defensively. A
    non-default ``text_col`` always recomputes (withColumn replaces the
    stale `__words`), so asking for a different column can never be
    silently served the old tokens.

    CONTRACT: `__words` is an OWNED derived column — it is only ever
    written by this function and is assumed to be `words_expr("text")`
    of the CURRENT `text` column. Any operator that rewrites or
    normalizes `text` on a frame that may already be tokenized must
    call drop_words() first (or pass ``fresh=True`` here); otherwise
    the fast path would serve stale tokens silently."""
    if fresh:
        return df.withColumn("__words", words_expr(text_col))
    if text_col == "text" and "__words" in df.columns:
        return df
    return df.withColumn("__words", words_expr(text_col))


def drop_words(df: DataFrame) -> DataFrame:
    """Invalidate the owned `__words` cache column (see with_words'
    CONTRACT). Call before/after any transformation that rewrites the
    `text` column on a possibly-tokenized frame, so the next with_words
    re-tokenizes instead of serving stale tokens."""
    return df.drop("__words") if "__words" in df.columns else df


def shingles_expr(words: Column, k: int = 3) -> Column:
    """k-word shingles as strings; empty array when the doc is shorter
    than k words. Pass a MATERIALIZED column (see with_words), not an
    inline words_expr() — the lambda below references `words` k times
    per element."""
    idx = F.sequence(F.lit(0), F.size(words) - k)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j + 1) for j in range(k)]
    )
    return F.when(F.size(words) >= k, F.transform(idx, mk)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(df: DataFrame, k: int = 3, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) pairs — the inverted-index input for Jaccard /
    MinHash. At 100 TB this is the frame to bucket by shingle.

    The input is hash-repartitioned on doc_id first: shingling is
    CPU-heavy per row, and a small parquet file arrives as a single
    partition (one core does everything). The hash partitioning is also
    exactly what the downstream per-doc aggregations (minhash/simhash
    groupBy doc_id) need, so Catalyst elides their shuffle.

    ``distinct=False`` skips the per-doc set semantics for consumers that
    are duplicate-insensitive (min-hash: min over repeated hashes is the
    min) — one less aggregate pass, and explode->hash->min-agg fuses into
    a single codegen stage. Set-based consumers (Jaccard counts, simhash
    bit sums) need the default."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    out = with_words(df.repartition(parallelism, "doc_id")).select(
        "doc_id",
        F.explode(shingles_expr(F.col("__words"), k)).alias("shingle"),
    )
    return out.distinct() if distinct else out


def minhash_agg_columns() -> list[Column]:
    """16 min-hash aggregate columns over an ``h`` column (use after
    grouping exploded shingle hashes by doc)."""
    return [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    ]


def band_key_exprs() -> list[tuple[int, Column]]:
    """(band_index, band_key) for LSH bucketing: key = joined minhashes of
    the band's rows."""
    out = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        out.append((b, F.concat_ws("-", *[c.cast("string") for c in cols])))
    return out


def simhash_bit_sums() -> list[Column]:
    """Per-bit sign sums over an ``h`` column (grouped per doc)."""
    return [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]


def simhash_combine() -> Column:
    """Fold the 32 sign sums into the simhash value (bit i set iff sum>0)."""
    acc = F.lit(0).cast("bigint")
    for i in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(0)
    return acc


# -- 64-bit SimHash (Manku et al., WWW'07 production width) -----------------
# The signature is stored as two independent 32-bit halves (sh_lo = bits
# 0..31, sh_hi = bits 32..63), never as one 64-bit integer: both engines
# parse hex via signed-BIGINT casts, and a genuine 64-bit value with the
# top bit set would overflow the cast (Spark runs ANSI mode and throws).
# Halves lose nothing — banding reads 16-bit windows of a half, and
# hamming distance is the sum of the halves' popcounts. Bit i's vote
# comes from md5 word 1 (chars 1-8) for the low half and md5 word 2
# (chars 9-16) for the high half: independent bits, same one-md5-per-
# shingle cost as the 32-bit form.
SIMHASH64_BITS = 64
_HALF = 32


def h32b(col: Column) -> Column:
    """Second 32-bit word of md5 (hex chars 9-16) — the independent hash
    that feeds simhash bits 32..63 (same value in DuckDB via SQL_H32B)."""
    return F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("bigint")


def simhash64_bit_sums() -> list[Column]:
    """Per-bit sign sums for all 64 bits over ``h`` (word 1) and ``h2``
    (word 2) columns, grouped per doc. Aliases t0..t63."""
    cols = []
    for i in range(SIMHASH64_BITS):
        src = F.col("h") if i < _HALF else F.col("h2")
        cols.append(
            F.sum(
                F.when(
                    F.shiftright(src, i % _HALF).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"t{i}")
        )
    return cols


def simhash64_halves() -> tuple[Column, Column]:
    """(sh_lo, sh_hi): fold sign sums t0..t31 / t32..t63 into the two
    32-bit signature halves (bit set iff sum > 0; each half < 2^32)."""

    def half(lo: int) -> Column:
        acc = F.lit(0).cast("bigint")
        for i in range(_HALF):
            acc = acc + F.when(F.col(f"t{lo + i}") > 0, F.lit(1 << i)).otherwise(0)
        return acc

    return half(0), half(_HALF)


# -- DuckDB (oracle) side ---------------------------------------------------
SQL_H32 = "CAST('0x' || substr(md5({s}), 1, 8) AS BIGINT)"

SQL_WORDS = "list_filter(string_split(lower({t}), ' '), w -> len(w) > 0)"

# count = len(ws)-2 shingles, 1-based list indexing
SQL_SHINGLES3 = (
    "list_transform(range(1, len({ws}) - 1), i -> "
    "{ws}[i] || ' ' || {ws}[i+1] || ' ' || {ws}[i+2])"
)


def sql_doc_shingles(table: str = "documents") -> str:
    ws = SQL_WORDS.format(t="text")
    return f"""
    SELECT DISTINCT doc_id, unnest({SQL_SHINGLES3.format(ws='ws')}) AS shingle
    FROM (SELECT doc_id, {ws} AS ws FROM {table})
    """


def sql_minhash_aggs() -> str:
    h = "h"
    return ",\n           ".join(
        f"MIN(({a} * {h} + {b}) % {MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )


def sql_band_keys() -> list[tuple[int, str]]:
    out = []
    for b in range(LSH_BANDS):
        parts = " || '-' || ".join(
            f"CAST(mh{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        out.append((b, parts))
    return out


def sql_simhash_bit_sums() -> str:
    return ",\n           ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS)
    )


def sql_simhash_combine() -> str:
    return " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )


SQL_H32B = "CAST('0x' || substr(md5({s}), 9, 8) AS BIGINT)"


def sql_simhash64_bit_sums() -> str:
    parts = []
    for i in range(SIMHASH64_BITS):
        src = "h" if i < _HALF else "h2"
        parts.append(
            f"SUM(CASE WHEN ({src} >> {i % _HALF}) & 1 = 1 THEN 1 ELSE -1 END) AS t{i}"
        )
    return ",\n           ".join(parts)


def sql_simhash64_halves() -> tuple[str, str]:
    def half(lo: int) -> str:
        return " + ".join(
            f"(CASE WHEN t{lo + i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
            for i in range(_HALF)
        )

    return half(0), half(_HALF)
