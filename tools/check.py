#!/usr/bin/env python3
"""Dev-side stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = views over <sfDir>/*.parquet), load the Spark result parquet,
sort columns by name + rows, and compare values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for q, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{q}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {q}: no spark output dir"); n_bad += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {q}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {q}: rows spark={len(got)} oracle={len(want)}"); n_bad += 1; continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind != b.dtype.kind and 'O' not in (a.dtype.kind, b.dtype.kind):
                # int-vs-float etc. — the driver's hash gate treats this as
                # a mismatch even when values agree; mirror that here.
                bad_cols.append(f"{c} (dtype mismatch: spark={a.dtype} oracle={b.dtype})")
                continue
            if a.dtype.kind == 'f' and b.dtype.kind == 'f':
                eq = np.isclose(a.astype(float), b.astype(float),
                                rtol=0, atol=0, equal_nan=True)
            else:
                eq = (a.astype(object).values == b.astype(object).values) | \
                     (a.isna().values & b.isna().values)
            if not eq.all():
                i = int(np.argmin(eq))
                bad_cols.append(f"{c} (row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}, "
                                f"{int((~eq).sum())} diffs)")
        if bad_cols:
            print(f"FAIL {q}: value diffs: {'; '.join(bad_cols)}"); n_bad += 1
        else:
            print(f"OK   {q} ({len(got)} rows, {len(got.columns)} cols)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
