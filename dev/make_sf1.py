#!/usr/bin/env python3
"""Synthetic 10x scale-up of sf0.1 -> a "sf1" directory, for the
bounded-window scaling probe (r13 verdict item 5: measure, don't
argue, that the whitelisted unpartitioned windows stay flat when the
corpus grows 10x).

Shape: each FACT table is unioned 10x with primary keys shifted by
copy * (max_key + 1), so key cardinality scales with volume (a naive
10x duplication would collapse groupBys onto identical keys and
understate shuffle width). Timestamps/calendars are kept AS IS - the
whitelist's central claim is that day-grain / domain-grain
pre-aggregation stays constant while row volume grows, so the
calendar span must NOT grow. Dimension tables (region, nation) stay
single-copy: they are join targets, and duplicating a primary key
would corrupt join semantics rather than scale anything.

Usage: python3 dev/make_sf1.py [outdir]   (default /tmp/graft_sf1)
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10

# table -> columns to shift by copy*(max+1); every other column rides
FACTS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}
DIMS = ["nation", "region"]

con = duckdb.connect()
con.sql(f"ATTACH ':memory:' AS out")
import os
os.makedirs(OUT, exist_ok=True)

for t, keys in FACTS.items():
    src = f"'{SRC}/{t}.parquet'"
    shifts = {k: con.sql(f"SELECT max({k}) + 1 FROM {src}").fetchone()[0]
              for k in keys}
    cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]
    selects = []
    for i in range(COPIES):
        exprs = []
        for c in cols:
            if c in shifts and i > 0:
                exprs.append(f"{c} + {i * shifts[c]} AS {c}")
            else:
                exprs.append(c)
        selects.append(f"SELECT {', '.join(exprs)} FROM {src}")
    q = " UNION ALL ".join(selects)
    con.sql(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

for t in DIMS:
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied (dimension, single copy)")
print(f"done -> {OUT}")
