#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads the Verify dump
(outDir/<name>/ parquet + oracle_sql.json), runs each oracle in DuckDB over
the sf parquet tables, and compares rows/schema/values.

Usage: verify_local.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes the per-query result map in the driver
artifact's shape ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) so every round carries its own
correctness evidence even when the driver's artifact delivery fails
(r18: CORRECTNESS_r18.json arrived as an empty object).
"""
import json, math, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    return df.reset_index(drop=True)

def compare(name, spark_df, oracle_df):
    issues = []
    if len(spark_df) != len(oracle_df):
        return [f"ROWS {len(spark_df)} vs {len(oracle_df)}"]
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return [f"SCHEMA {list(a.columns)} vs {list(b.columns)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype(float); bvf = bv.astype(float)
            both_nan = avf.isna() & bvf.isna()
            diff = (avf - bvf).abs()
            bad = ~both_nan & ~(avf == bvf)
            if bad.any():
                md = diff[bad].max()
                issues.append(f"FLOAT {c}: {int(bad.sum())} cells differ, maxdiff={md}")
        else:
            av2 = av.astype(object).where(~av.isna(), None)
            bv2 = bv.astype(object).where(~bv.isna(), None)
            neq = [i for i, (x, y) in enumerate(zip(av2, bv2)) if x != y]
            if neq:
                i = neq[0]
                issues.append(f"VAL {c}: {len(neq)} cells differ, first row {i}: {av2[i]!r} vs {bv2[i]!r}")
    return issues

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    artifact = {}  # driver-artifact-shaped per-query record
    names = sorted([p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")])
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            artifact[name] = dict(rows_match=False, schema_match=False,
                                  hash_match=False, spark_rows=0,
                                  oracle_rows=None, err="NO_OUTPUT")
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            results[name] = f"rows_only({len(spark_df)})"
            artifact[name] = dict(rows_match=len(spark_df) > 0,
                                  schema_match=None, hash_match=None,
                                  spark_rows=len(spark_df),
                                  oracle_rows=None, err=None)
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERR: {e}"
            artifact[name] = dict(rows_match=False, schema_match=False,
                                  hash_match=False, spark_rows=len(spark_df),
                                  oracle_rows=None, err=f"ORACLE_ERR: {e}")
            continue
        issues = compare(name, spark_df, oracle_df)
        results[name] = "OK" if not issues else "; ".join(issues)
        artifact[name] = dict(
            rows_match=len(spark_df) == len(oracle_df),
            schema_match=not any(i.startswith("SCHEMA") for i in issues),
            hash_match=not issues,
            spark_rows=len(spark_df), oracle_rows=len(oracle_df),
            err=None if not issues else "; ".join(issues))
    n_ok = sum(1 for v in results.values() if v == "OK")
    n_rows_only = sum(1 for v in results.values() if str(v).startswith("rows_only"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else ('INFO' if str(v).startswith('rows_only') else 'FAIL'):4} {k}: {v}")
    print(f"\n{n_ok} oracle-matched, {n_rows_only} rows-only, "
          f"{len(results)-n_ok-n_rows_only} failing, of {len(results)}")
    # any oracle entries with no output dir?
    missing = set(oracles) - set(names)
    if missing:
        print("MISSING OUTPUT:", sorted(missing))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(artifact)} queries)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
