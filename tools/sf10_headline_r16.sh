#!/bin/bash
# r16 (r15 verdict item 4): refresh the sf10 HEADLINE wall record on an
# idle host — the last committed full sf10 wall record is r9
# (r09_sf10_headline.json) plus r13's constrained-heap spill slice.
# Runs the same 33 heavy LLM-pipeline queries at sfgen/sf10 with steal
# telemetry (Bench emits per-query sec/cpu_s/run_s/steal_s and
# spill_mb_total since r14), then applies the cpu-aware gate vs the r9
# per-query numbers: a wall ratio only counts as a regression when the
# cpu ratio moves with it (the host-steal adjudication discipline,
# SURVEY note 22).
set -u -o pipefail
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r16_sf10_headline.json}
SF=${2:-sfgen/sf10}
QUERIES=$(python3 -c "
import json
print(','.join(sorted(json.load(open('bench_baselines/r09_sf10_headline.json'))['queries'])))")
echo "headline queries: $QUERIES"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_QUERIES="$QUERIES" \
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
  bash tools/runmain.sh graft.Bench > /tmp/sf10_headline_r16.out 2>/dev/null
grep '"metric"' /tmp/sf10_headline_r16.out > /dev/null || { echo "bench died"; exit 1; }

python3 - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
cur = json.load(open("bench_full.json"))
r9 = json.load(open("bench_baselines/r09_sf10_headline.json"))
qs, gate = {}, {"n_regressed": 0, "n_wall_only": 0, "flags": []}
for q, m in sorted(cur["queries"].items()):
    row = {"sec": m["sec"], "cpu_s": m.get("cpu_s"),
           "steal_s": m.get("steal_s", 0.0)}
    old = r9["queries"].get(q)
    if old and old.get("sf10_sec"):
        row["r9_sec"] = old["sf10_sec"]
        row["wall_ratio"] = round(m["sec"] / old["sf10_sec"], 2)
        if old.get("cpu_s") and m.get("cpu_s"):
            row["cpu_ratio"] = round(m["cpu_s"] / old["cpu_s"], 2)
        wr, cr = row["wall_ratio"], row.get("cpu_ratio")
        if wr > 2.0:
            if cr is not None and cr > 1.5:
                gate["n_regressed"] += 1
                gate["flags"].append({"q": q, "wall": wr, "cpu": cr,
                                      "class": "regressed"})
            else:
                gate["n_wall_only"] += 1
                gate["flags"].append({"q": q, "wall": wr, "cpu": cr,
                                      "class": "wall_only(steal/host)"})
    qs[q] = row
walls = sorted(v["wall_ratio"] for v in qs.values() if "wall_ratio" in v)
cpus = sorted(v["cpu_ratio"] for v in qs.values() if "cpu_ratio" in v)
med = lambda a: a[len(a) // 2] if a else None
rec = {
 "record": "r16 sf10 headline refresh (r15 verdict item 4): the r9 33-query "
           "heavy list re-run idle at sfgen/sf10 with steal telemetry; "
           "cpu-aware gate vs the r9 per-query record. Medians compare "
           "SEVEN ROUNDS of intervening work (r9 binary -> r16 binary, "
           "including the r16 embed occupancy cap + staging).",
 "commit": os.popen("git rev-parse HEAD").read().strip(),
 "config": {"master": "local[32]", "heap": os.environ.get("SPARK_DRIVER_MEM", "64g"),
            "sink": "noop", "load_at_launch": os.environ.get("LOAD_GATE_AT_START"),
            "steal_jiffies_3s_at_launch": os.environ.get("STEAL_GATE_AT_START")},
 "total_sec": cur["value"], "n_queries": cur["n_queries"],
 "n_err": cur["n_err"], "spill_mb_total": cur.get("spill_mb_total"),
 "total_steal_s": round(sum(v["steal_s"] or 0 for v in qs.values()), 1),
 "median_wall_ratio_vs_r9": med(walls), "median_cpu_ratio_vs_r9": med(cpus),
 "gate": gate, "queries": qs,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in ("total_sec", "n_err",
      "median_wall_ratio_vs_r9", "median_cpu_ratio_vs_r9", "gate",
      "spill_mb_total", "total_steal_s")}))
EOF
git checkout bench_full.json
