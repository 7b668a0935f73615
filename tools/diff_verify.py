#!/usr/bin/env python3
"""Bit-identity diff of two graft.Verify output dirs.

Usage: diff_verify.py DIR_A DIR_B [query ...]

For every query present in both dirs (or the listed subset), reads the
parquet dump, sorts columns by name and rows by all columns, and
compares content hashes. Exit 1 on any mismatch. Used to prove
plan-shape rewrites (e.g. the r12 heavy-bucket sub-refinement) are
bit-identical before they land.
"""
import sys, os, hashlib
import duckdb

a, b = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) or None
la = set(os.listdir(a)) - {"oracle_sql.json", "resume.log"}
lb = set(os.listdir(b)) - {"oracle_sql.json", "resume.log"}
qs = sorted(la & lb)
if only:
    qs = [q for q in qs if q in only]
con = duckdb.connect()
bad = 0
# A query present in only one dir means that run crashed or skipped it —
# counting it identical-by-omission would let a rewrite that breaks a
# query outright pass the bit-identity proof (r12 advisory). FAIL loud.
for q in sorted(la ^ lb):
    if only and q not in only:
        continue
    print(f"FAIL {q}: present only in {'A' if q in la else 'B'}")
    bad += 1
for q in qs:
    def h(d):
        rel = con.sql(f"SELECT * FROM read_parquet('{d}/{q}/*.parquet')")
        cols = sorted(rel.columns)
        sel = ", ".join(f'"{c}"' for c in cols)
        rows = con.sql(
            f"SELECT {sel} FROM read_parquet('{d}/{q}/*.parquet') ORDER BY ALL"
        ).fetchall()
        m = hashlib.sha256()
        for r in rows:
            m.update(repr(r).encode())
        return len(rows), tuple(cols), m.hexdigest()
    try:
        ra, rb = h(a), h(b)
    except Exception as e:
        print(f"ERR  {q}: {e}")
        bad += 1
        continue
    if ra == rb:
        print(f"PASS {q} rows={ra[0]}")
    else:
        print(f"FAIL {q} a={ra[:2]} b={rb[:2]} hash_a={ra[2][:12]} hash_b={rb[2][:12]}")
        bad += 1
print(f"{'FAIL' if bad else 'OK'}: {len(qs) - bad}/{len(qs)} identical")
sys.exit(1 if bad else 0)
