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

Usage: python3 scripts/gen_sf.py <srcDir> <dstDir> <reps>
"""
import os
import sys

import duckdb

src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


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

for table, plan in PLANS.items():
    srcp = f"read_parquet('{src}/{table}.parquet')"
    if plan is None:
        sql = f"SELECT * FROM {srcp}"
    else:
        sql = " UNION ALL ".join(
            f"SELECT {plan.format(i=i)} FROM {srcp}" for i in range(reps))
    con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")
