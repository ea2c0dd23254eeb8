#!/usr/bin/env python3
"""Build a local sf1 test set as a x10 structured scale-up of the
driver's sf0.1 tables (no network, no TPC-H generator in this
environment). Bench-only data: the goal is to exercise PLAN-SIZE
behavior (broadcast thresholds, AQE switches, state growth) on the
full headline set, not to extend the correctness gate — the oracle
gate stays on the driver-generated sf tables.

Scaling rules (id-offset replicas, FK-consistent):
  - region/nation: fixed dimension tables, copied as-is (real TPC-H
    keeps them constant across SFs too).
  - customer/supplier/part/orders/lineitem: 10 replicas with every
    key/FK offset by replica*stride so joins stay 1:1 with sf0.1
    semantics at 10x the rows.
  - events: event_id/user_id offset (10x users, same per-user shape).
  - documents: replica 0 verbatim; replicas 1-9 token-shuffle each
    text with a seeded permutation — token MULTISET preserved (quality
    and language screens see the same distributions) while shingle
    ORDER differs, so replicas are NOT near-duplicates and the dedup
    family sees a genuinely 10x-larger distinct corpus instead of
    fake 10-clusters.
  - embeddings: replicas get deterministic per-dim jitter (~1e-3) so
    ANN cells grow 10x in population without 10 exact copies per
    point.

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=target/sf1]
"""
import random
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
REPLICAS = 10

con = duckdb.connect()
con.execute(f"CREATE TABLE reps AS SELECT unnest(range({REPLICAS})) AS r")


def copy(table):
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
        f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
    )


def scale(table, sql):
    con.execute(
        f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
    )


import os

os.makedirs(DST, exist_ok=True)

copy("region")
copy("nation")

# strides: next power-of-10 above the sf0.1 max key keeps offset keys
# readable and collision-free
scale("customer", f"""
  SELECT c_custkey + r*100000 AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet'), reps""")
scale("supplier", f"""
  SELECT s_suppkey + r*10000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet'), reps""")
scale("part", f"""
  SELECT p_partkey + r*100000 AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM read_parquet('{SRC}/part.parquet'), reps""")
scale("orders", f"""
  SELECT o_orderkey + r*10000000 AS o_orderkey,
         o_custkey + r*100000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet'), reps""")
scale("lineitem", f"""
  SELECT l_orderkey + r*10000000 AS l_orderkey,
         l_partkey + r*100000 AS l_partkey,
         l_suppkey + r*10000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet'), reps""")
scale("events", f"""
  SELECT event_id + r*1000000 AS event_id, ts,
         user_id + r*1000000 AS user_id, event_type, value, props
  FROM read_parquet('{SRC}/events.parquet'), reps""")

# documents: python-side seeded token shuffle (deterministic)
rows = con.execute(
    f"SELECT doc_id, text, lang, source, n_chars "
    f"FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
).fetchall()
out = []
for r in range(REPLICAS):
    for doc_id, text, lang, source, n_chars in rows:
        if r == 0:
            t = text
        else:
            toks = text.split(" ")
            rng = random.Random((r << 32) ^ doc_id)
            rng.shuffle(toks)
            t = " ".join(toks)
        out.append((doc_id + r * 100000, t, lang, source, len(t)))
con.execute(
    "CREATE TABLE docs1 (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
    "source VARCHAR, n_chars BIGINT)"
)
con.executemany("INSERT INTO docs1 VALUES (?, ?, ?, ?, ?)", out)
scale("documents", "SELECT * FROM docs1 ORDER BY doc_id")

# embeddings: deterministic jitter via hash-derived offsets in SQL
scale("embeddings", f"""
  SELECT vec_id + r*100000 AS vec_id,
         CASE WHEN r = 0 THEN embedding
              ELSE list_transform(
                     list_zip(embedding, range(1, len(embedding) + 1)),
                     z -> CAST(z[1] + (CAST(hash(vec_id*1000 + r*100 + z[2]) % 2001 AS BIGINT) - 1000) / 1e6
                          AS FLOAT))
         END AS embedding,
         label
  FROM read_parquet('{SRC}/embeddings.parquet'), reps""")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")
print(f"sf1 written to {DST}")
