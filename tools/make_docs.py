#!/usr/bin/env python3
"""Documents-only corpus scaler for the recrawl benchmark: N token-
shuffled id-offset replicas of a source documents table (same rule as
make_sf1.py's documents branch — token MULTISETS preserved so the
quality screens see identical distributions, shingle ORDER broken so
replicas are not near-duplicates). Bench-only data; the correctness
gate stays on the driver tables.

Usage: python3 tools/make_docs.py [src=target/sf1] [dst=target/docs] [replicas=10]
"""
import os
import random
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/docs"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
os.makedirs(DST, exist_ok=True)
rows = con.execute(
    f"SELECT doc_id, text, lang, source, n_chars "
    f"FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
).fetchall()
stride = 10 ** len(str(max(r[0] for r in rows)))
con.execute(
    "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
    "source VARCHAR, n_chars BIGINT)"
)
for r in range(REPLICAS):
    out = []
    for doc_id, text, lang, source, n_chars in rows:
        if r == 0:
            t = text
        else:
            toks = text.split(" ")
            rng = random.Random((r << 33) ^ doc_id)
            rng.shuffle(toks)
            t = " ".join(toks)
        out.append((doc_id + r * stride, t, lang, source, len(t)))
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?, ?)", out)
con.execute(
    f"COPY (SELECT * FROM docs ORDER BY doc_id) "
    f"TO '{DST}/documents.parquet' (FORMAT PARQUET)"
)
n = con.execute(
    f"SELECT count(*), max(doc_id) FROM read_parquet('{DST}/documents.parquet')"
).fetchone()
print(f"documents: {n[0]} rows, max id {n[1]} -> {DST}")
