#!/usr/bin/env python3
"""Dev-only local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers <sfDir>/*.parquet as DuckDB
views, runs each oracle SQL, and compares against the Spark parquet dump in
<verifyOutDir>/<name>/ — columns sorted by name, rows sorted, exact value
compare (tiny float tolerance reported separately so near-misses are visible).

This script is developer tooling only; the shipped library is pure Scala/Spark.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_spark(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # CHECK_SKIP=q101_dedup_clusters,... — skip named oracles (e.g. q101 at
    # sf0.1: the reach-enumeration recursive CTE is infeasible in DuckDB 1.0
    # on that SF's 2652-node giant component; q101 is covered there by the
    # in-JVM union-find spec in GraftSpec instead).
    skip = set(filter(None, os.environ.get("CHECK_SKIP", "").split(",")))
    # CHECK_ONLY=q155,q35 — prefix-match subset (mirrors SPARK_GRAFT_ONLY)
    only = [p for p in os.environ.get("CHECK_ONLY", "").split(",") if p]
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name} (CHECK_SKIP)"); continue
        if only and not any(name.startswith(p) for p in only):
            continue
        sql = oracle[name]
        spark_df = load_spark(out_dir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        exact = True; close = True; bad_cols = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                a = sv.astype(float).to_numpy(); b = dv.astype(float).to_numpy()
                eq = (a == b) | (np.isnan(a) & np.isnan(b))
                if not eq.all():
                    exact = False; bad_cols.append(c)
                    if not np.allclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True):
                        close = False
            else:
                if not sv.astype(str).equals(dv.astype(str)):
                    exact = False; close = False; bad_cols.append(c)
        dtypes_differ = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                         if str(s[c].dtype) != str(d[c].dtype)]
        if exact:
            flag = f" [dtype diff: {dtypes_differ}]" if dtypes_differ else ""
            print(f"PASS {name} ({len(s)} rows){flag}"); n_pass += 1
        else:
            level = "CLOSE(float ulp)" if close else "MISMATCH"
            print(f"FAIL {name}: {level} in cols {bad_cols}"); n_fail += 1
            for c in bad_cols[:2]:
                m = (s[c].astype(str) != d[c].astype(str))
                idx = m[m].index[:3]
                for i in idx:
                    print(f"   row{i} {c}: spark={s[c][i]!r} duck={d[c][i]!r}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
