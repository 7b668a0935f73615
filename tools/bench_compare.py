#!/usr/bin/env python3
"""Per-query bench regression report between two Bench JSON lines.

Usage: bench_compare.py <old.json> <new.json> [threshold_ratio=1.5]
Prints per-query old/new/ratio, flags regressions beyond the threshold,
exits 1 if any flagged. Accepts raw `{"metric":...}` lines or files
whose first '{' starts the JSON (sbt-prefixed logs).
"""
import json, sys

def load(path):
    s = open(path).read()
    d = json.loads(s[s.index("{"):])
    out = {}
    for k, v in d["queries"].items():
        out[k] = v if isinstance(v, (int, float)) else v.get("sec", float("nan"))
    return out, d["value"]

old, old_total = load(sys.argv[1])
new, new_total = load(sys.argv[2])
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

flagged = []
print(f"{'query':26s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
for q in sorted(set(old) | set(new)):
    o, n = old.get(q), new.get(q)
    if o is None:
        print(f"{q:26s} {'-':>7s} {n:7.2f}    new")
        continue
    if n is None:
        print(f"{q:26s} {o:7.2f} {'-':>7s}    gone")
        continue
    ratio = n / o if o > 0 else float("inf")
    mark = " <-- REGRESSION" if ratio > thresh and n > 0.5 else ""
    if mark:
        flagged.append(q)
    print(f"{q:26s} {o:7.2f} {n:7.2f} {ratio:6.2f}{mark}")
print(f"\ntotal: {old_total:.2f}s -> {new_total:.2f}s")
if flagged:
    print(f"FLAGGED: {flagged}")
sys.exit(1 if flagged else 0)
