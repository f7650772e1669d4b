"""Deterministic numeric helpers for oracle-comparable aggregates.

Floating-point sums are order-dependent; Spark's partial aggregation order
differs from DuckDB's, so ``sum(double)`` is NOT hash-stable across engines.
The fix is exact arithmetic: cast each addend to a fixed-scale decimal,
sum (decimal addition is exact and associative), then cast the total back
to double. Both engines then produce the bit-identical double.

This costs nothing at scale — decimal sums are still a single partial+final
hash aggregate, map-side combined — and removes the entire class of
"correct but hash-mismatched" failures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 8: wide enough that products of 2-decimal inputs (<= 6 decimal
# digits) are recovered EXACTLY from the double's binary value in both
# engines — no boundary rounding, so Spark's shortest-string-HALF_UP cast
# and DuckDB's exact-binary cast agree bit-for-bit. 30 integral digits of
# headroom still covers 100 TB-scale sums.
DEC = "decimal(38,8)"

# The exact sum is rounded to cent scale BEFORE the double cast: a
# 10-digit-integral sum at scale 8 carries 18 significant digits — more
# than a double holds — and the engines' decimal->double conversions then
# round the excess differently (one last-ulp apart per group, observed at
# sf0.1). At scale 2 the total stays <= 15 significant digits up to
# 10^13, where both conversions are exact-then-correctly-rounded and
# bit-identical. All dsum users aggregate monetary/2-decimal inputs, so
# cents IS the semantic precision; decimal rounding itself (HALF_UP,
# away-from-zero both engines) is exact arithmetic and cross-engine safe.
SUM_SCALE = 2


def dsum(col: Column | str) -> Column:
    """Exact sum of a double column via decimal, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), SUM_SCALE).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent average: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.round(F.sum(c.cast(DEC)), SUM_SCALE).cast("double") / F.count(c)
    )


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,8))), {SUM_SCALE})"
        " AS DOUBLE)"
    )


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,8))), {SUM_SCALE})"
        f" AS DOUBLE) / COUNT({expr})"
    )
