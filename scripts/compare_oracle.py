#!/usr/bin/env python3
"""Local correctness harness: replay SparkEntry.oracleSql in DuckDB against
the same test tables and diff each query's parquet output from graft.Verify.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>

Dev-side tool only (duckdb/pandas are driver-side deps, not library deps).
Mirrors the driver's t2 gate: sort columns by name, sort rows, compare
values (NaN-safe).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sorting across dtypes
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return df.loc[order].reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = canon(con.sql(sql).df())
            got = canon(
                duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        diff_cols = []
        for c in expect.columns:
            a, b = expect[c], got[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
            else:
                eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            if not eq.all():
                diff_cols.append((c, int((~eq).sum())))
        if diff_cols:
            print(f"FAIL {name}: value diffs {diff_cols}")
            for c, _ in diff_cols[:2]:
                bad = expect[c] != got[c]
                print("  expect:", expect.loc[bad, c].head(3).tolist(),
                      " got:", got.loc[bad, c].head(3).tolist())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expect)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
