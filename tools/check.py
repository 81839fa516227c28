#!/usr/bin/env python3
"""Local oracle-parity check, mimicking the driver: run graft.Verify
output vs DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        # normalize numerics: ints of any width -> int64, floats -> float64
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # single-file tables (driver testdata) or Spark-written
        # directories of part files (tools/GenSf1 output)
        import os
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # Queries that threw in graft.Verify never produce a parquet dir;
    # without this they'd silently shrink coverage (round-8 lesson).
    # Verify records them in errors.json — surface each as a FAIL row.
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except Exception:
        errors = {}
    for name, err in sorted(errors.items()):
        print(f"FAIL {name}: did not execute: {err[:200]}")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in errors:
            continue  # already reported as FAIL above
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
                continue
            except AssertionError as e:
                print(f"FAIL {name}: values differ: {str(e)[:400]}")
                n_fail += 1
    # queries with no oracle
    import os
    for name in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{name}") and name not in oracle:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"ROWS {name}: {n} rows (no oracle)")
            n_skip += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
