#!/usr/bin/env python3
"""Local driver-mimic: run Verify output against DuckDB oracles.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors what the round driver does (per the builder prompt): for each
query, read the Spark parquet result and the DuckDB result of the oracle
SQL on the same tables, sort columns by name, compare row count, dtypes
(loosely), and value hashes under sorted-row order.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        else:
            for c in a.columns:
                if str(a[c].dtype) != str(b[c].dtype):
                    status.append(f"dtype[{c}] {a[c].dtype} vs {b[c].dtype}")
        if not status:
            try:
                # exact: a hash-based driver has no float tolerance
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                status.append("values differ: " + str(e).split("\n")[0:3].__str__())
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
