#!/usr/bin/env python3
"""Prototype a DuckDB oracle SQL against an existing Verify dump.

Usage: proto_oracle.py <name> <sql-file-or-literal> [sfdir] [outdir]
Compares row count + sorted-hash like verify_local.py does.
"""
import sys, duckdb, hashlib

name = sys.argv[1]
sql = sys.argv[2]
sfdir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
outdir = sys.argv[4] if len(sys.argv) > 4 else "target/verify_out"
if sql.endswith(".sql"):
    sql = open(sql).read()
sql = sql.replace("{SFDIR}", sfdir)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    except Exception:
        pass

spark = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
oracle = con.execute(sql).fetchdf()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

s, o = canon(spark), canon(oracle)
print(f"spark rows={len(s)} cols={list(s.columns)}")
print(f"oracle rows={len(o)} cols={list(o.columns)}")
def h(df):
    return hashlib.sha256(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()[:16]
if list(s.columns) != list(o.columns):
    print("SCHEMA MISMATCH")
    sys.exit(1)
print("hash", h(s), h(o), "MATCH" if h(s) == h(o) else "MISMATCH")
if h(s) != h(o):
    import pandas as pd
    merged = s.merge(o, how="outer", indicator=True)
    diff = merged[merged["_merge"] != "both"]
    print(diff.head(30).to_string())
