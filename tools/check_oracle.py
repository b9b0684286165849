#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet produced by graft.Verify, runs the
corresponding SQL from oracle_sql.json in DuckDB over the sf tables, and
compares: row count, column names (sorted), and a hash of all values with
columns sorted by name and rows sorted canonically. This is dev tooling only
(driver-side python env); the engine itself is pure Scala/Spark.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    # Sort on the same representation that gets hashed: round floats to the
    # hash precision (%.10g) first, so low-bit float differences between
    # engines cannot reorder tied rows (ADVICE r01).
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].apply(lambda v: float(f"{v:.10g}") if pd.notna(v) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    return hashlib.sha256(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()[:16]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # Worklist = oracle keys ∪ result dirs: a query that crashed in
    # graft.Verify (no output dir) must count as FAIL, not vanish (ADVICE r01).
    dirs = set(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
    names = sorted(dirs | set(oracles))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        if name not in dirs:
            print(f"  [FAIL-miss] {name}: no Verify output (query crashed?)")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e_ = canon(got.copy()), canon(exp.copy())
        ok_cols = list(g.columns) == list(e_.columns)
        ok_rows = len(g) == len(e_)
        ok_hash = ok_cols and ok_rows and h(g) == h(e_)
        if ok_hash:
            print(f"  [OK       ] {name}: rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  [FAIL     ] {name}: cols_match={ok_cols} rows {len(g)} vs {len(e_)}")
            if not ok_cols:
                print(f"      spark cols: {list(g.columns)}")
                print(f"      duck  cols: {list(e_.columns)}")
            elif ok_rows:
                diff = (g != e_) & ~(g.isna() & e_.isna())
                bad = diff.any(axis=1)
                print("      first diffs (spark vs duck):")
                print(pd.concat([g[bad].head(3), e_[bad].head(3)]).to_string())
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
