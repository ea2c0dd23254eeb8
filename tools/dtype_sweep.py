#!/usr/bin/env python3
"""Dtype sweep: the driver's correctness hash is dtype-sensitive, so a
query whose VALUES match can still hash-red when DuckDB's result lands in
pandas with a different dtype than the Spark parquet dump (r14's
p99_epoch_mixture: SUM -> HUGEINT -> float64 vs Spark int64). This tool
replays every oracle in DuckDB and diffs the pandas dtypes column by
column against the Verify dump, flagging:
  - FLOAT/INT mismatches (the hash-killer class), and
  - int-width mismatches (tolerated by the driver today, but one
    HUGEINT-producing edit away from the killer class).

Usage: dtype_sweep.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    killers, widths = [], []
    for name in sorted(oracles):
        dump = os.path.join(out_dir, name)
        if not os.path.isdir(dump):
            continue
        try:
            o = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"SKIP {name}: oracle error {e}")
            continue
        s = pd.read_parquet(dump)
        for c in sorted(set(o.columns) & set(s.columns)):
            od, sd = str(o[c].dtype), str(s[c].dtype)
            if od == sd:
                continue
            o_f, s_f = od.startswith("float"), sd.startswith("float")
            o_i, s_i = od.startswith("int"), sd.startswith("int")

            def is_date_col(series, dt):
                import datetime
                if dt.startswith("datetime64"):
                    return True
                nn = series.dropna()
                return dt == "object" and len(nn) > 0 and all(
                    isinstance(v, datetime.date) for v in nn.head(5))

            if o_f != s_f:
                killers.append(f"{name}.{c}: oracle {od} vs spark {sd}")
            elif o_i and s_i:
                widths.append(f"{name}.{c}: oracle {od} vs spark {sd}")
            elif is_date_col(o[c], od) and is_date_col(s[c], sd):
                # DATE columns land as datetime64 from DuckDB but as
                # object-of-datetime.date from a Spark parquet dump; the
                # driver's compare normalizes dates, so this is benign
                # (l2_datetime_funcs.plus30 has been hash-green this way
                # since round 1)
                pass
            else:
                killers.append(f"{name}.{c}: oracle {od} vs spark {sd}")
    print(f"\n== float/int mismatches (hash-killers): {len(killers)}")
    for k in killers:
        print("  KILLER", k)
    print(f"== int-width mismatches (latent): {len(widths)}")
    for w in widths:
        print("  WIDTH ", w)
    sys.exit(1 if killers else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
