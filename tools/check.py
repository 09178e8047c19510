#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with views registered over the
<sfDir> parquet tables, and compares: columns sorted by name, rows sorted by
all columns, exact value equality (floats compared bitwise via repr).
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} != {len(e)}")
                n_fail += 1
                continue
            gs = g.map(cell)
            es = e.map(cell)
            neq = (gs != es)
            if neq.any().any():
                bad_cols = [c for c in gs.columns if neq[c].any()]
                idx = neq.any(axis=1)
                print(f"FAIL {name}: {int(neq.sum().sum())} cell diffs in {bad_cols}")
                print("  spark:", g[idx].head(3).to_dict("records"))
                print("  duck :", e[idx].head(3).to_dict("records"))
                n_fail += 1
                continue
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as ex:
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    # A query that threw in Verify leaves an _ERROR sentinel dir; count
    # any that have no oracle entry too, so a broken oracle-less query
    # can't shrink the gate silently.
    for entry in sorted(os.listdir(out_dir)):
        sentinel = os.path.join(out_dir, entry, "_ERROR")
        if entry not in oracle and os.path.isfile(sentinel):
            print(f"ERROR {entry}: {open(sentinel).read().strip()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
