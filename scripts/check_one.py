#!/usr/bin/env python3
"""Builder-local single-query oracle check: like check_oracle.py but only
for the named queries. Usage: check_one.py <sfDir> <verifyOutDir> <q1,q2,...>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
sys.path.insert(0, os.path.dirname(__file__))
from check_oracle import TABLES, canon, value_hash

def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = True
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING_SPARK_OUTPUT"); ok = False; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"{name}: ROWS_ONLY rows={len(got)}"); continue
        exp = con.sql(oracle[name]).df()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name}: SCHEMA_MISMATCH {list(g.columns)} vs {list(e.columns)}")
            ok = False; continue
        if len(g) != len(e):
            print(f"{name}: ROWS_MISMATCH {len(g)} vs {len(e)}"); ok = False; continue
        hg, he = value_hash(g), value_hash(e)
        if hg != he:
            print(f"{name}: HASH_MISMATCH")
            diff = (g.astype(str) != e.astype(str))
            rows = diff.any(axis=1)
            print(g[rows].head(5))
            print(e[rows].head(5))
            ok = False
        else:
            print(f"{name}: OK rows={len(g)}")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3].split(","))
