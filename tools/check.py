#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the testdata tables and compare with the parquet dumps written by
graft.Verify. Usage: check.py <sfDir> <verifyOutDir> [query...]"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, key=lambda s: s.astype(str))
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # ScaleUp output: Spark directory-style parquet
            p = f"{p}/*.parquet"
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        # exact value compare (hash-style)
        eq = got.astype(str).equals(want.astype(str))
        if eq:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: value mismatch")
            diff = (got.astype(str) != want.astype(str))
            idx = diff.any(axis=1)
            print("  spark:", got[idx].head(3).to_dict("records"))
            print("  duck :", want[idx].head(3).to_dict("records"))
            n_fail += 1
    # rows-only queries have no oracle entry; still surface their error
    # markers (graft.Verify writes a `_verify_error` parquet on throw)
    for d in sorted(os.listdir(out_dir)):
        if d in oracle or not os.path.isdir(f"{out_dir}/{d}") or (only and d not in only):
            continue
        try:
            cols = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{d}/*.parquet') LIMIT 1").df()
        except Exception:
            continue
        if "_verify_error" in cols.columns:
            print(f"FAIL {d}: {cols['_verify_error'].iloc[0]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
