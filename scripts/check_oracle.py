#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare row/schema/values with the
Spark parquet dumps produced by graft.Verify."""
import json, sys, glob
import duckdb, pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails += 1
        continue
    # sort rows deterministically for value compare
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mismatch = []
    for c in exp.columns:
        a, b = exp_s[c], got_s[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                ok = ((a.isna() & b.isna()) | ((a - b).abs() < 1e-9)).all()
            else:
                ok = (a.astype(str).fillna("") == b.astype(str).fillna("")).all()
        except Exception:
            ok = False
        if not ok:
            mismatch.append(c)
    if mismatch:
        print(f"FAIL {name}: value mismatch in {mismatch}")
        for c in mismatch[:2]:
            diff = exp_s[c].astype(str) != got_s[c].astype(str)
            print("  exp:", exp_s[diff][c].head(3).tolist())
            print("  got:", got_s[diff][c].head(3).tolist())
        fails += 1
    else:
        print(f"OK   {name} ({len(exp)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
