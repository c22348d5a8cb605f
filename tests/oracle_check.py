"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the same
parquet dir, compares row count, column names, and order-insensitive
values (exact for ints/strings, exact-after-round for floats).

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
    # dtype-family mismatches (int vs float) would change the driver's
    # value hashes even when numerically equal — flag them
    for c in sorted(sdf.columns):
        skind = sdf[c].dtype.kind if hasattr(sdf[c].dtype, "kind") else "O"
        okind = odf[c].dtype.kind if hasattr(odf[c].dtype, "kind") else "O"
        if {skind, okind} == {"i", "f"}:
            problems.append(f"dtype family: col {c} spark={sdf[c].dtype} oracle={odf[c].dtype}")
    s, o = canon(sdf), canon(odf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c], o[c]
            if str(sv.dtype).startswith("float") or str(ov.dtype).startswith("float"):
                import numpy as np

                bad = ~(
                    (sv.isna() & ov.isna())
                    | (np.isclose(sv.astype(float), ov.astype(float), rtol=0, atol=0, equal_nan=True))
                )
                if bad.any():
                    i = bad.idxmax()
                    problems.append(
                        f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r}"
                    )
            else:
                if not sv.astype(str).equals(ov.astype(str)):
                    bad = sv.astype(str) != ov.astype(str)
                    i = bad.idxmax()
                    problems.append(
                        f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r}"
                    )
    return problems

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    # oracle comparisons collect full result sets — opt in to the
    # relaxed driver cap the library deliberately doesn't default to
    os.environ.setdefault("SPARK_MAX_RESULT_SIZE", "8g")

    import __spark_entry__ as E
    from hogzilla_spark import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only, {len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0

if __name__ == "__main__":
    raise SystemExit(main())
