"""Local replica of the driver's correctness harness.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin via DuckDB
at a given scale factor and reports row-count / schema(column-name) /
value-level matches. Strict by default: values must compare EXACTLY (the
driver hashes values, so "close" floats are still failures — our queries
are written to be bit-deterministic cross-engine).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # unify list-likes for comparison (DuckDB yields numpy arrays)
        if df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _col_kind(s: pd.Series) -> str:
    """Canonical type kind of a column, for cross-engine dtype-strict compare.

    The driver hashes *formatted* values, so int ``1`` vs double ``1.0`` is a
    hash mismatch even though Python ``1 == 1.0``. Collapse dtypes into kinds
    that format identically (all int widths together, all float widths
    together) and fail on any kind skew — this catches DuckDB ``SIGN()``→int8
    vs Spark ``signum``→double and HUGEINT→float64 vs bigint before the
    driver does.
    """
    import datetime
    import decimal

    import numpy as np

    dt = s.dtype
    if str(dt).startswith("datetime"):
        return "timestamp"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        return "float"
    # object column: classify by the first non-null value
    for v in s:
        if v is None:
            continue
        try:
            if pd.isna(v):
                continue
        except (TypeError, ValueError):
            pass
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, str):
            return "str"
        if isinstance(v, bytes):
            return "binary"
        if isinstance(v, datetime.datetime):
            return "timestamp"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, dict):
            return "struct"
        return type(v).__name__
    return "all-null"


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare_record(
    name: str, spark_df, oracle_df: pd.DataFrame
) -> tuple[dict, list[str]]:
    """Compare and return (driver-shaped record, problem strings).

    The record mirrors the driver's CORRECTNESS_r{N}.json entry shape:
    rows_match / schema_match / hash_match / spark_rows / oracle_rows /
    err — so the full-surface local sweep can be committed as a
    machine-readable artifact beside the driver's 50-query sample."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    # schema_match = column NAMES match (the driver's notion); kind skew
    # is recorded separately under kinds_match so a consumer can tell a
    # real column-set mismatch from a formatting-kind mismatch (r6 advice
    # — previously schema_match doubled for both and was set
    # inconsistently across the early-return paths).
    rec = {
        "rows_match": False,
        "schema_match": False,
        "kinds_match": None,  # None = kind check did not run
        "hash_match": False,
        "spark_rows": len(sp),
        "oracle_rows": len(oracle_df),
        "err": None,
    }
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"schema mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return rec, problems
    rec["schema_match"] = True
    kind_problems: list[str] = []
    for col in sorted(sp.columns):
        ks, ko = _col_kind(sp[col]), _col_kind(oracle_df[col])
        if "all-null" in (ks, ko):
            continue
        if ks != ko:
            kind_problems.append(
                f"dtype-kind mismatch col={col}: spark={ks}({sp[col].dtype}) "
                f"oracle={ko}({oracle_df[col].dtype}) — driver hash WILL differ"
            )
    rec["kinds_match"] = not kind_problems
    problems.extend(kind_problems)
    if len(sp) != len(oracle_df):
        problems.append(f"row count mismatch: spark={len(sp)} oracle={len(oracle_df)}")
        return rec, problems
    rec["rows_match"] = True
    if problems:
        return rec, problems
    a, b = _normalize(sp), _normalize(oracle_df)
    n_bad = 0
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _cells_equal(x, y):
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} total mismatched cells")
    rec["hash_match"] = n_bad == 0
    return rec, problems


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> list[str]:
    return compare_record(name, spark_df, oracle_df)[1]


def main() -> int:
    args = sys.argv[1:]
    emit_path = None
    sample_n = None
    sample_seed = 0
    for a in list(args):
        if a.startswith("--emit-correctness-json"):
            emit_path = a.split("=", 1)[1] if "=" in a else "CORRECTNESS_LOCAL.json"
            args.remove(a)
        elif a.startswith("--sample="):
            sample_n = int(a.split("=", 1)[1])
            args.remove(a)
        elif a.startswith("--seed="):
            sample_seed = int(a.split("=", 1)[1])
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import __spark_entry__ as entrymod
    from psql_streamer_spark.session import get_spark

    spark = get_spark("oracle_check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if sample_n is not None and not only:
        # fresh random re-verification subset (--sample N --seed R): the
        # driver's own CORRECTNESS sample has been static across rounds,
        # so each round also commits a seeded random slice — queries the
        # driver never samples get visibly re-verified round over round
        import random

        names = sorted(qs)
        only = set(random.Random(sample_seed).sample(names, min(sample_n, len(names))))
        print(f"sampled {len(only)} / {len(names)} queries (seed={sample_seed})")
    con = _duck_con(sf_dir)

    failed = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "kinds_match": None,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                rec, problems = compare_record(name, sdf, odf)
            else:
                # rows-only: the driver's weaker check for non-SQL-
                # expressible ops — must execute and return a well-formed
                # frame; hash_match is null (not checked), mirroring how
                # the driver records these
                n = sdf.count()
                problems = [] if n >= 0 else ["negative count?"]
                rec.update(
                    rows_match=True,
                    schema_match=True,
                    hash_match=None,
                    spark_rows=n,
                    oracle_rows=None,
                    rows_only=True,
                )
                print(f"  [rows-only] {name}: {n} rows")
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        records[name] = rec
        dt = time.time() - t0
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} ({dt:.1f}s)")
        for p in problems:
            print(f"     {p}")
        if problems:
            failed.append(name)

    if emit_path:
        import json

        with open(emit_path, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {len(records)} records to {emit_path}")

    n_run = len(records)
    print(f"\n{n_run - len(failed)}/{n_run} queries match" + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
