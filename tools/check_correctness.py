"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, sorted-by-name schema, and
exact values (rows sorted by all columns). Stricter than a value-hash:
if this passes, any order-insensitive hash comparison passes.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_indexer_spark.plans import REGISTRY  # noqa: E402
from blockchain_indexer_spark.session import get_spark  # noqa: E402
from blockchain_indexer_spark.sources.parquet import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        dtype = df[col].dtype
        if isinstance(dtype, pd.DatetimeTZDtype):
            df[col] = df[col].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def _dtype_family(dtype) -> str:
    """int / float / bool / datetime / other — the granularity at which
    the driver's value-hash can diverge while values_equal still holds
    (r3: DuckDB HUGEINT arithmetic landing as float64 hashed 3.0 vs
    Spark int64's 3 on doc_chunk_packing)."""
    kind = getattr(dtype, "kind", "O")
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    return "other"


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    sp, du = canon(spark_pdf), canon(duck_pdf)
    if list(sp.columns) != list(du.columns):
        problems.append(f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row count differs: spark={len(sp)} duck={len(du)}")
        return problems
    for col in sp.columns:
        sf, df_ = _dtype_family(sp[col].dtype), _dtype_family(du[col].dtype)
        # int-vs-float is exactly the hash-divergence class the driver
        # sees and values_equal(3, 3.0) masks; 'other' (object) columns
        # arise from NULL-bearing ints in either engine and stay
        # value-compared only.
        if {sf, df_} == {"int", "float"}:
            problems.append(
                f"col {col!r}: dtype family differs: spark={sp[col].dtype} "
                f"duck={du[col].dtype} (driver hash would diverge on e.g. 3 vs 3.0)"
            )
    for col in sp.columns:
        sv, dv = sp[col].tolist(), du[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {col!r}: {len(bad)}/{len(sv)} values differ; first at row {i}: "
                f"spark={a!r} ({type(a).__name__}) duck={b!r} ({type(b).__name__})"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    con = duck_con(sf_dir)
    failures = 0
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(spark_pdf) == 0 and name not in ():
                print(f"      warning: 0 rows")
            continue
        try:
            duck_pdf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
