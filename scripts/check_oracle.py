#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: reads the
Verify.main output dir (result parquets + oracle_sql.json), runs each
oracle against the sf parquet tables, and compares rows/schema/hash with
columns sorted by name (the driver's rule). Usage:
  python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [only...]
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}/*.parquet')"
                if os.path.isdir(t) else
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

def canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(df.columns), rows

n_pass = n_fail = n_noor = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    if only and name not in only:
        continue
    spark_df = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    if name not in oracle:
        n_noor += 1
        print(f"{name}: no_oracle rows={len(spark_df)}")
        continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        n_fail += 1
        print(f"{name}: ORACLE ERROR {e}")
        continue
    sc, sr = canon(spark_df)
    oc, orows = canon(odf)
    ok_rows = len(sr) == len(orows)
    ok_schema = sc == oc
    ok_hash = sr == orows
    if ok_rows and ok_schema and ok_hash:
        n_pass += 1
        print(f"{name}: PASS rows={len(sr)}")
    else:
        n_fail += 1
        print(f"{name}: FAIL rows {len(sr)} vs {len(orows)}, schema {sc} vs {oc}, "
              f"hash={ok_hash}")
        if ok_schema and ok_rows:
            for a, b in zip(sr, orows):
                if a != b:
                    print(f"  first diff: spark={a} oracle={b}")
                    break
print(f"pass={n_pass} fail={n_fail} no_oracle={n_noor}")
sys.exit(1 if n_fail else 0)
