#!/usr/bin/env python3
"""Local oracle-parity harness (dev tool only — NOT part of the library).

Mimics the driver's correctness gate: for each query output parquet written
by `graft.Verify` and each entry in oracle_sql.json, run the SQL in DuckDB
over the same sf dir's parquet tables, sort columns by name, and compare
values row-by-row. Reports exact-match / mismatch with a diff preview.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1; continue
        try:
            got = pd.read_parquet(files[0])
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1; continue
        def norm(s):
            # array/list cells (np arrays from parquet, lists from duckdb)
            # compare as tuples so pandas equality is scalar
            if s.dtype == object and len(s) and isinstance(
                    s.iloc[0], (list, np.ndarray)):
                return s.map(lambda v: tuple(np.asarray(v).tolist())), True
            return s, False
        bad_cols = []
        for c in got.columns:
            ga, arr_a = norm(got[c])
            gb, arr_b = norm(exp[c])
            if arr_a or arr_b:
                if not ga.eq(gb).all():
                    bad_cols.append((c, "array cells differ"))
                continue
            a, b = got[c].values, exp[c].values
            if got[c].dtype != exp[c].dtype:
                bad_cols.append((c, f"dtype {got[c].dtype} vs {exp[c].dtype}"))
                continue
            try:
                if got[c].dtype == object:
                    eq = pd.Series(a).fillna("\0").eq(pd.Series(b).fillna("\0")).all()
                else:
                    eq = ((pd.Series(a).isna() & pd.Series(b).isna()) |
                          (pd.Series(a) == pd.Series(b))).all()
            except Exception as e:
                bad_cols.append((c, f"cmp error {e}")); continue
            if not eq:
                idx = np.where(~(((pd.Series(a).isna()) & (pd.Series(b).isna())) |
                                 (pd.Series(a) == pd.Series(b))))[0][:3]
                bad_cols.append((c, [(int(i), a[i], b[i]) for i in idx]))
        if bad_cols:
            print(f"FAIL {name}: {bad_cols}"); n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
