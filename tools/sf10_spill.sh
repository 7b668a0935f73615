#!/bin/bash
# Spill accounting above sf0.1 (r12 verdict item 7). Two legs:
#
#  1. CONSTRAINED-HEAP BENCH at sf10: the spill-prone family (robust
#     stats + the r10 sf1-lowmem spillers) under a 12g driver — per-query
#     wall and diskBytesSpilled, the "spill_mb is a real number at scale"
#     record the sf0.1 benches can't produce.
#  2. PERCENTILE A/B at a 4g heap: graft.tools.SpillProbe runs the
#     built-in exact `percentile` and the percentile_spill aggregate in
#     SEPARATE JVMs on the same ~60M-distinct-value column. Expected:
#     builtin dies (ExitOnOutOfMemoryError; its distinct-value counts
#     map cannot spill), spillable completes and reports its run-file MB
#     (PercentileBuf telemetry; invisible to task-metric spill).
#
# Output: bench_baselines/r13_sf10_spill.json
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r13_sf10_spill.json}
SF=${2:-sfgen/sf10}
FAMILY="q_percentiles,q_mad_outliers,q_approx_quantile,q_winsorize,q_approx_distinct,q_copurchase,q_khop,q_tpch_q1,q_tpch_q18,q_rank_transform"
D=$(mktemp -d /tmp/sf10spill.XXXX)
echo "spill probe dir: $D"

SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_QUERIES="$FAMILY" SPARK_DRIVER_MEM=12g \
  bash tools/runmain.sh graft.Bench > "$D/bench.stdout" 2> "$D/bench.stderr" \
  || { echo "bench leg failed"; exit 1; }
mv bench_full.json "$D/bench12g.json"

run_probe() { # mode heap
  GRAFT_JVM_EXTRA="-XX:+ExitOnOutOfMemoryError" SPARK_DRIVER_MEM=$2 \
    timeout 1200 bash tools/runmain.sh graft.tools.SpillProbe "$1" "$SF" \
    > "$D/$1.stdout" 2> "$D/$1.stderr"
  echo $?
}
SPILL_RC=$(run_probe spill 4g)
BUILTIN_RC=$(run_probe builtin 4g)

python3 - "$D" "$OUT" "$SPILL_RC" "$BUILTIN_RC" <<'EOF'
import json, sys, re
d, out, spill_rc, builtin_rc = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
bench = json.load(open(f"{d}/bench12g.json"))["queries"]
qs = {q: {"sec": v.get("sec"), "spill_mb": round(v.get("spill_mb", 0.0), 1),
          "cpu_s": v.get("cpu_s")} | ({"err": v["err"]} if "err" in v else {})
      for q, v in bench.items()}
def last_json(p):
    txt = open(p, errors="replace").read()
    m = re.findall(r'\{"mode".*\}', txt)
    return json.loads(m[-1]) if m else None
spill = last_json(f"{d}/spill.stdout")
oom = "OutOfMemoryError" in open(f"{d}/builtin.stderr", errors="replace").read() or \
      "OutOfMemoryError" in open(f"{d}/builtin.stdout", errors="replace").read()
rec = {
 "record": "r13 spill accounting above sf0.1: (1) constrained 12g bench at "
           "sf10 (60M-row lineitem) over the robust-stats + known-spiller "
           "family with per-query task-metric spill; (2) 4g-heap A/B of "
           "built-in exact percentile vs percentile_spill on a ~60M-distinct "
           "value column (extendedprice perturbed by the unique shifted "
           "orderkey — replication keeps natural measures at sf0.1 "
           "cardinality, a real corpus's continuous measures are "
           "all-distinct).",
 "bench_12g": {"queries": qs,
               "n_err": sum(1 for v in qs.values() if "err" in v),
               "spill_mb_total": round(sum(v["spill_mb"] for v in qs.values()), 1)},
 "percentile_ab_4g": {
   "spill_variant": {"exit": spill_rc, "result": spill},
   "builtin_variant": {"exit": builtin_rc, "oom_observed": oom},
 },
 "green": spill_rc == 0 and spill is not None and builtin_rc != 0 and oom
          and not any("err" in v for v in qs.values()),
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({"green": rec["green"],
                  "bench_spill_mb_total": rec["bench_12g"]["spill_mb_total"],
                  "bench_n_err": rec["bench_12g"]["n_err"],
                  "spill_exit": spill_rc, "builtin_exit": builtin_rc,
                  "builtin_oom": oom}))
sys.exit(0 if rec["green"] else 1)
EOF
