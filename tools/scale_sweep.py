#!/usr/bin/env python3
"""Multi-scale correctness sweep: merge per-scale DuckDB compares into
one machine-checkable artifact (r8, promoting COVERAGE.md's by-hand
three-scale claim into the gate contract).

Usage:
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Verify \
      /root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1 \
      target/verify_scales
  python3 tools/scale_sweep.py target/verify_scales CORRECTNESS_SCALES.json

For each <outRoot>/<scale>/ produced by the multi-scale Verify, runs the
same compare as tools/check.py (columns sorted by name, rows sorted,
exact cell equality, floats via repr) against the matching
/root/testdata/<scale> tables, and writes
{query: {scale: "pass"|"FAIL"|"ERR: ..."}} plus a summary.
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


def compare(sf_dir: str, out_dir: str) -> dict:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    marks = {}
    for i, (name, sql) in enumerate(sorted(oracle.items())):
        # progress heartbeat: the sf0.1 oracles (recursive-CTE dedup,
        # k-means replays) run for minutes in DuckDB — without this a
        # watcher cannot tell "working" from "wedged"
        print(f"[scale_sweep] {out_dir} {i + 1}/{len(oracle)} {name}",
              file=sys.stderr, flush=True)
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                marks[name] = f"FAIL: columns {list(g.columns)} != {list(e.columns)}"
                continue
            if len(g) != len(e):
                marks[name] = f"FAIL: rows {len(g)} != {len(e)}"
                continue
            gh = g.map(cell)
            eh = e.map(cell)
            if not gh.equals(eh):
                marks[name] = "FAIL: values"
                continue
            marks[name] = "pass"
        except Exception as ex:  # noqa: BLE001 - recorded, not raised
            marks[name] = f"ERR: {ex}"
    # A query that threw in Verify leaves an _ERROR sentinel dir; pick up
    # any that have no oracle entry too (a sentinel must never vanish
    # from the artifact just because the query is oracle-less).
    for entry in sorted(os.listdir(out_dir)):
        sentinel = os.path.join(out_dir, entry, "_ERROR")
        if entry not in marks and os.path.isfile(sentinel):
            marks[entry] = "ERR: " + open(sentinel).read().strip()
    con.close()
    return marks


def main(out_root: str, merged_path: str) -> int:
    scales = sorted(d for d in os.listdir(out_root)
                    if os.path.isdir(os.path.join(out_root, d)))
    if not scales:
        print(f"no scale subdirs under {out_root}")
        return 2
    merged: dict = {}
    for sc in scales:
        marks = compare(f"/root/testdata/{sc}", os.path.join(out_root, sc))
        for q, m in marks.items():
            merged.setdefault(q, {})[sc] = m
        n_pass = sum(1 for m in marks.values() if m == "pass")
        print(f"{sc}: {n_pass}/{len(marks)} pass")
    bad = {q: ms for q, ms in merged.items()
           if any(m != "pass" for m in ms.values())}
    artifact = {"scales": scales, "queries": merged,
                "n_queries": len(merged), "n_bad": len(bad)}
    with open(merged_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"== merged -> {merged_path}: {len(merged)} queries x "
          f"{len(scales)} scales, {len(bad)} with failures")
    for q, ms in sorted(bad.items()):
        print(f"   BAD {q}: {ms}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
