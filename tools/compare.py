#!/usr/bin/env python3
"""Dev harness replicating the driver's t2 correctness gate:
run each oracle SQL in DuckDB against the sf parquet tables, load the
Verify-dumped parquet, and compare (columns sorted by name, rows sorted,
exact values). Usage: compare.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_result(outdir, name):
    path = os.path.join(outdir, name)
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for sorting/compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(os.listdir(outdir))
    n_pass = n_fail = 0
    for name in names:
        if not os.path.isdir(os.path.join(outdir, name)):
            continue
        got = load_result(outdir, name)
        if got is None:
            print(f"[FAIL] {name}: no parquet output"); n_fail += 1; continue
        if name not in oracle:
            print(f"[rows] {name}: {len(got)} rows (no oracle)"); continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
                eq = np.allclose(gv.astype(float), ev.astype(float), rtol=0, atol=0, equal_nan=True)
                close = np.allclose(gv.astype(float), ev.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True)
                if not eq:
                    bad.append((c, "exact" if close else "VALUE", None))
            else:
                try:
                    neq = ~(pd.Series(gv).astype(str) == pd.Series(ev).astype(str))
                except Exception:
                    neq = pd.Series([True])
                if neq.any():
                    i = int(np.argmax(neq.values))
                    bad.append((c, "VALUE", (g[c].iloc[i], e[c].iloc[i])))
        if bad:
            print(f"[FAIL] {name}: {len(g)} rows; mismatched cols: {bad[:4]}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(g)} rows x {len(g.columns)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
