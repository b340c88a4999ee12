#!/usr/bin/env python3
"""Time the DuckDB oracle SQL per query against an SF directory (dev
tool — the engine-vs-single-node comparison side of BENCH_NOTES).

Exclusions (reported, not silent):
  - rtcm_*: their oracles read graft.Verify's synthetic-pipeline dumps,
    not the SF tables — no data-bound comparison to make;
  - d02/d05/d06: their oracle SQL *states quadratic all-pairs
    semantics* as the correctness contract; the engine's plan is the
    banded/linear path, so timing DuckDB on the quadratic form measures
    the contract's asymptotics, not engine efficiency.

Usage: python3 scripts/bench_duck.py <sfDir> <oracle_sql.json> [threads] [only] [runs]
  only: optional comma-separated allowlist of query names ('-' = all)
  runs: run each query N times and report the MINIMUM (warm best-of-N,
        the symmetric sf10 protocol; default 1 = cold single-shot)
"""
import json
import sys
import time

import duckdb

SF_DIR = sys.argv[1]
ORACLE = sys.argv[2]
THREADS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ONLY = (set(sys.argv[4].split(","))
        if len(sys.argv) > 4 and sys.argv[4] != "-" else None)
RUNS = int(sys.argv[5]) if len(sys.argv) > 5 else 1
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
EXCLUDE_PREFIX = ("rtcm_",)
EXCLUDE = {"d02_minhash_jaccard_pairs", "d05_embedding_neardup",
           "d08_minhash_dfcap",
           "d06_signlsh_neardup", "d07_neardup_keeper_sets"}

con = duckdb.connect()
con.execute(f"SET threads TO {THREADS}")
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
with open(ORACLE) as f:
    oracle = json.load(f)

times = {}
skipped = []
for name in sorted(oracle):
    if name.startswith(EXCLUDE_PREFIX) or name in EXCLUDE \
            or (ONLY is not None and name not in ONLY):
        skipped.append(name)
        continue
    best = None
    for _ in range(RUNS):
        t0 = time.time()
        # .arrow() fetch — fetchall() would charge DuckDB for Python row
        # conversion (round-4 protocol correction; the engine side pays a
        # comparable columnar materialization in its noop sink)
        con.sql(oracle[name]).arrow()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    times[name] = round(best, 3)
    print(f"[duck] {name} {best:.3f}s", file=sys.stderr, flush=True)

print(json.dumps({"metric": "duckdb_total",
                  "value": round(sum(times.values()), 3),
                  "unit": "sec", "queries": times,
                  "skipped": skipped, "sf": SF_DIR, "threads": THREADS}))
