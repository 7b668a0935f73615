#!/usr/bin/env python3
"""Local stand-in for the driver's duckdb correctness gate.

Runs each oracle_sql.json query in duckdb against the sf tables,
loads the Spark parquet result, sorts columns by name and rows by all
columns, and compares values exactly (doubles bitwise via repr).
Usage: compare_oracle.py <sfdir> <verify_outdir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
        got = pd.read_parquet(f"{outdir}/{name}")
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        if list(want.columns) != list(got.columns):
            fails.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            continue
        if len(want) != len(got):
            fails.append((name, f"rows {len(got)} != {len(want)}"))
            continue
        def canon(df):
            out = df.copy()
            for c in out.columns:
                out[c] = out[c].map(lambda v: repr(v))
            return out.sort_values(by=list(out.columns)).reset_index(drop=True)
        cw, cg = canon(want), canon(got)
        if not cw.equals(cg):
            diff = (cw != cg).any(axis=1)
            idx = diff[diff].index[:3]
            detail = "; ".join(
                f"row{i}: got {cg.loc[i].to_dict()} want {cw.loc[i].to_dict()}" for i in idx)
            fails.append((name, f"value mismatch: {detail}"))
        else:
            print(f"PASS {name} ({len(got)} rows)")
    except Exception as e:
        fails.append((name, f"error: {e}"))

rows_only = sorted(set(
    os.path.basename(p) for p in glob.glob(f"{outdir}/q_*")) - set(oracle))
for name in rows_only:
    n = len(pd.read_parquet(f"{outdir}/{name}"))
    print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n} rows)")
    if n == 0:
        fails.append((name, "rows-only check: 0 rows"))

print()
for name, why in fails:
    print(f"FAIL {name}: {why[:400]}")
sys.exit(1 if fails else 0)
