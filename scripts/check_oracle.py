#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's
parquet dump from Verify, run the paired oracle SQL in DuckDB over the same
sf tables, and compare row count, schema (column names), and value hash
(columns sorted by name, rows sorted, 'NULL' markers for nulls).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="first",
                        kind="mergesort").reset_index(drop=True)
    return df

def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s:
            if pd.isna(v):
                h.update(b"NULL|")
            else:
                if isinstance(v, float):
                    h.update(repr(v).encode())
                else:
                    h.update(str(v).encode())
                h.update(b"|")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    # queries without an oracle get the driver's weaker rows-only check
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            files = glob.glob(f"{out_dir}/{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            results[d] = "OK" if n > 0 else "ROWS_ONLY_EMPTY"
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                results[name] = "MISSING_SPARK_OUTPUT"
                continue
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} oracle={list(e.columns)}"
            elif len(g) != len(e):
                results[name] = f"ROWCOUNT {len(g)} vs {len(e)}"
            elif value_hash(g) != value_hash(e):
                # find first differing cell for debugging
                diff = None
                for c in g.columns:
                    a, b = g[c], e[c]
                    neq = ~((a == b) | (a.isna() & b.isna()))
                    if neq.any():
                        i = int(neq.idxmax())
                        diff = f"col={c} row={i} spark={a[i]!r} oracle={b[i]!r}"
                        break
                results[name] = f"HASH_MISMATCH ({diff})"
            else:
                results[name] = "OK"
        except Exception as ex:
            results[name] = f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL'}  {k}: {v}")
    print(f"\n{ok}/{len(results)} queries match")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
