#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Spark result
parquet written by graft.Verify.

Usage: python3 scripts/check.py [sfDir] [outDir]
(Dev tool only — the Scala library has no duckdb dependency.)
"""
import json
import os
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form per cell (decimal.Decimal, floats, None)
    def cell(v):
        if v is None or v != v:
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    names = sorted(os.listdir(OUT_DIR))
    for name in names:
        path = os.path.join(OUT_DIR, name)
        if not os.path.isdir(path):
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            print(f"  ✗ {name}: column mismatch spark={gc} duck={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"  ✗ {name}: {len(gr)} vs {len(er)} rows; first diffs:")
            for a, b in (diff or list(zip(gr[:2], er[:2])))[:3]:
                print(f"      spark={a}\n      duck ={b}")
            if len(gr) != len(er):
                only_g = [r for r in gr if r not in set(map(tuple, er))][:2]
                print(f"      spark-only: {only_g}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(gr)} rows)")
    missing = set(oracle) - {n for n in names if os.path.isdir(os.path.join(OUT_DIR, n))}
    for m in sorted(missing):
        print(f"  ✗ {m}: no spark output written")
        n_fail += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
