#!/usr/bin/env python3
"""Scale a test-data SF directory by key-offset concatenation (dev
tool; the driver provides sf0.001/0.01/0.1 — this builds a data-bound
bench point, e.g. sf1 = 10 x sf0.1).

Each fact copy i gets its keys shifted by i * (max_key + 1) so key
uniqueness, FK relationships (lineitem->orders->customer,
events.user_id ⊂ customer.c_custkey) and per-key cardinalities are
preserved; dimensions (region/nation) are shared. Timestamps are left
as-is: time-bucketed queries see 10x density, which is exactly the
data-bound behavior being measured.

Usage: python3 scripts/gen_sf.py <srcDir> <dstDir> <reps> [salt] [onlyTablesCsv]

Plain replication makes every document/embedding an exact N-fold
duplicate cluster and stacks N x the users into the SAME time
windows, so pair-reporting near-dup queries (d02/d06), exact-span
removal (d09/d10), LSH candidates (d03) and interval co-activity
(r02) see output quadratic in the replication factor — an artifact
of the synthetic scaling, not of the engine. `salt` mode keeps those
honest while scaling:
  - documents: replica i > 0 gets a per-replica injective TOKEN
    RENAMING (every whitespace token w -> "w~i"). Within a replica
    the corpus structure — shingle sets, Jaccard, duplicated 5-gram
    spans, minhash clusters — is preserved EXACTLY (renaming is
    consistent across the replica's docs), while cross-replica
    copies share ZERO tokens, hence zero shingles and zero 5-grams:
    cluster sizes, candidate counts and removable-span mass stay
    constant per replica as N grows. n_chars tracks the renamed
    text, keeping the n_chars == length(text) invariant.
  - embeddings: each replica i applies a deterministic ±1 sign pattern
    (bit (d-1) mod 10 of i flips dimension d) — an orthogonal diagonal
    map, so within-replica geometry (and the planted cos ≥ 0.99 pairs)
    is preserved EXACTLY while cross-replica copies decorrelate to
    cos ≈ 0.8 ≪ 0.99.
  - events: replica i's timestamps shift by i x (span + 1 h), so
    per-window event density and session co-activity stay constant —
    N x the data covers N x the time, the way a real system scales.
`onlyTablesCsv` regenerates a subset (link the rest from an unsalted
dir to avoid rewriting the 18 GB lineitem).

Output parquet is written with a bounded ROW_GROUP_SIZE so every
file has many row groups: Spark assigns scan tasks by byte-range
splits that can't subdivide a row group, so a one-row-group file is
a one-task scan no matter the split size (the round-8 t02 artifact).
"""
import os
import sys

import duckdb

src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
SALT = len(sys.argv) > 4 and sys.argv[4] == "salt"
ONLY = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
# 1000-rep UNION ALL chains exceed the default parser depth
con.execute("SET max_expression_depth TO 25000")


def stride(table, key):
    return con.sql(
        f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


O = stride("orders", "o_orderkey")
C = stride("customer", "c_custkey")
P = stride("part", "p_partkey")
S = stride("supplier", "s_suppkey")
E = stride("events", "event_id")
D = stride("documents", "doc_id")
V = stride("embeddings", "vec_id")

# table -> column expressions per copy i (None = copy dimension as-is)
PLANS = {
    "region": None,
    "nation": None,
    "customer": f"c_custkey + {{i}}*{C} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment",
    "supplier": f"s_suppkey + {{i}}*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal",
    "part": f"p_partkey + {{i}}*{P} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice",
    "orders": f"o_orderkey + {{i}}*{O} AS o_orderkey, o_custkey + {{i}}*{C} AS o_custkey, "
              "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    "lineitem": f"l_orderkey + {{i}}*{O} AS l_orderkey, l_partkey + {{i}}*{P} AS l_partkey, "
                f"l_suppkey + {{i}}*{S} AS l_suppkey, l_linenumber, l_quantity, "
                "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    "events": f"event_id + {{i}}*{E} AS event_id, ts, user_id + {{i}}*{C} AS user_id, "
              "event_type, value, props",
    "documents": f"doc_id + {{i}}*{D} AS doc_id, text, lang, source, n_chars",
    "embeddings": f"vec_id + {{i}}*{V} AS vec_id, embedding, label",
}

if SALT and reps > 1024:
    # the embedding sign patterns use 10 bits of the replica index:
    # replicas i and i+1024 would share a pattern and be exact
    # duplicates again — the quadratic blowup salt mode exists to avoid
    sys.exit("salt mode supports at most 1024 reps (10-bit sign patterns)")


EVENT_SPAN_US = None
if SALT:
    lo, hi = con.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) "
        f"FROM read_parquet('{src}/events.parquet')").fetchone()
    EVENT_SPAN_US = (hi - lo) + 3600_000_000  # span + 1 h guard gap


def salted_plan(table, i):
    """Replica-i column list for the salted near-dup-honest corpora."""
    if table == "documents":
        if i == 0:
            return PLANS["documents"].format(i=i)
        renamed = f"regexp_replace(text, '(\\S+)', '\\1~{i}', 'g')"
        return (f"doc_id + {i}*{D} AS doc_id, {renamed} AS text, "
                f"lang, source, length({renamed}) AS n_chars")
    if table == "events":
        return (f"event_id + {i}*{E} AS event_id, "
                f"ts + to_microseconds({i} * {EVENT_SPAN_US}) AS ts, "
                f"user_id + {i}*{C} AS user_id, event_type, value, props")
    if table == "embeddings":
        if i == 0:
            return PLANS["embeddings"].format(i=i)
        sign = (f"list_transform(range(1, 65), d -> CAST(embedding[d] * "
                f"(CASE WHEN (({i} >> ((d - 1) % 10)) & 1) = 1 THEN -1 ELSE 1 END) "
                f"AS REAL))")
        return f"vec_id + {i}*{V} AS vec_id, {sign} AS embedding, label"
    return PLANS[table].format(i=i)


for table, plan in PLANS.items():
    if ONLY is not None and table not in ONLY:
        continue
    srcp = f"read_parquet('{src}/{table}.parquet')"
    if plan is None:
        sql = f"SELECT * FROM {srcp}"
    elif SALT and table in ("documents", "embeddings", "events"):
        sql = " UNION ALL ".join(
            f"SELECT {salted_plan(table, i)} FROM {srcp}" for i in range(reps))
    else:
        sql = " UNION ALL ".join(
            f"SELECT {plan.format(i=i)} FROM {srcp}" for i in range(reps))
    # Many row groups per file (≥ ~64 when the table is big enough):
    # Spark's scan parallelism is bounded by row-group count, and
    # DuckDB's default (122 880 rows) leaves a 50 k-doc table as ONE
    # single-task row group.
    est = con.sql(f"SELECT count(*) FROM {srcp}").fetchone()[0] * \
        (1 if plan is None else reps)
    rg = max(2048, min(122880, est // 64))
    con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")
