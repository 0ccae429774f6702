#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
corresponding oracle_sql.json entry in DuckDB over the same parquet
tables, sorts columns by name, and compares values exactly (doubles
bit-exact). Reports per-query: rows / schema / hash match.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # row-order-insensitive compare: sort by all columns
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        pass
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            fails += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            fails += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            fails += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            fails += 1
            continue
        if not g.equals(e):
            diff_cols = [c for c in g.columns if not g[c].equals(e[c])]
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:3]:
                m = g[c] != e[c]
                print(f"   {c}: got {g[c][m].head(3).tolist()} exp {e[c][m].head(3).tolist()}")
            fails += 1
            continue
        print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - fails}/{len(oracle)} matched")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
