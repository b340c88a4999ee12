#!/usr/bin/env python3
"""Assemble BENCH_SF10.json — the warm sf10 symmetric engine-vs-DuckDB
per-query table (best-of-3, bucketed layout ON) — from the engine's
Bench detail output and bench_duck.py's record.

Usage: python3 scripts/bench_sf10.py <engine_detail.json> <duck.json> [out.json]

Reads the two artifacts, joins per query, emits:
  { "protocol": ..., "engine_total": s, "duckdb_total": s, "ratio": r,
    "n_queries": n, "queries": {name: {"engine": s, "duckdb": s,
    "ratio": r}}, "engine_only": {...}, "excluded": [...] }
Also prints a markdown table (worst ratios first) for BENCH_NOTES.
"""
import json
import sys

engine_path, duck_path = sys.argv[1], sys.argv[2]
out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SF10.json"

with open(engine_path) as f:
    eng = json.load(f)
with open(duck_path) as f:
    duck = json.load(f)

equeries = eng["queries"]
dqueries = duck["queries"]

joined = {}
engine_only = {}
for name, es in sorted(equeries.items()):
    ds = dqueries.get(name)
    if ds is None:
        engine_only[name] = es
    else:
        joined[name] = {"engine": es, "duckdb": ds,
                        "ratio": round(es / ds, 2) if ds > 0 else None}

etot = round(sum(v["engine"] for v in joined.values()), 3)
dtot = round(sum(v["duckdb"] for v in joined.values()), 3)
out = {
    "protocol": ("warm best-of-3 per query, both engines same host "
                 "back-to-back; engine: local[32] noop sink, bucketed "
                 "fact layout ON (SPARK_GRAFT_BUCKETED=1); duckdb: 32 "
                 "threads, .arrow() fetch; sf10 = 100x key-offset "
                 "replication of /root/testdata/sf0.1 (60M lineitem, "
                 "10M events, 500k docs, 200k vectors)"),
    "engine_total": etot,
    "duckdb_total": dtot,
    "ratio": round(etot / dtot, 2),
    "n_queries": len(joined),
    "queries": joined,
    "engine_only": engine_only,
    "excluded": sorted(set(duck.get("skipped", []))),
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=False)

print(f"engine {etot} s vs duckdb {dtot} s over {len(joined)} queries "
      f"-> aggregate ratio {out['ratio']}x")
print()
print("| query | engine s | DuckDB s | ratio |")
print("|---|---|---|---|")
for name, v in sorted(joined.items(), key=lambda kv: -(kv[1]["ratio"] or 0)):
    print(f"| {name} | {v['engine']:.2f} | {v['duckdb']:.2f} | {v['ratio']}x |")
print(f"| **TOTAL** | **{etot:.1f}** | **{dtot:.1f}** | **{out['ratio']}x** |")
