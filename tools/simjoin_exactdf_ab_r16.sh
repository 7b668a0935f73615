#!/bin/bash
# r16 (r15 verdict item 2): re-A/B the EXACT-DF rank path after the
# single-node-safe rework (bounded-heap smallest_k prefix aggregate
# replacing the collect_list+sort_array regroup whose object-agg sort
# fallback ENOSPC'd the r15 sf10 leg). Asserts output bit-identity
# sampled-vs-exact at sf0.1 AND at sf10 (the r15 record could only
# claim sf0.1 — the exact leg never completed at sf10), then measures
# the overhead at sf10 and attempts the k1000 (5M-doc) leg under the
# disk guard. A watcher kills any leg if free disk drops under 4 GB
# (this host has ONE ~25 GB-free volume; see the r15 ENOSPC notes).
set -u
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r16_simjoin_exactdf_ab.json}
D=${PROBE_DIR:-$(mktemp -d /tmp/sjexact16.XXXX)}
echo "probe dir: $D"

guard() { # pidfile-less disk guard: kill graft mains under 4G free
  while :; do
    avail=$(df -BG --output=avail / | tail -1 | tr -dc 0-9)
    if [ "$avail" -lt 4 ]; then
      echo "DISK GUARD FIRED (${avail}G free)" >> "$D/guard.log"
      pkill -f 'graft.(Bench|Verify)' || true
    fi
    sleep 20
  done
}
guard & GUARD_PID=$!
trap 'kill $GUARD_PID 2>/dev/null' EXIT

run() { # sfdir tag heap exact
  local sfdir=$1 tag=$2 heap=$3 exact=$4
  [ -f "$D/$tag.json" ] && return 0
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_QUERIES=q_simjoin_prefix \
  SPARK_DRIVER_MEM=$heap SPARK_GRAFT_SIMJOIN_EXACTDF=$exact \
    bash tools/runmain.sh graft.Bench > "$D/$tag.stdout" 2> "$D/$tag.stderr" \
    || return 1
  mv bench_full.json "$D/$tag.json"
}

diffat() { # sfdir tag heap
  local sfdir=$1 tag=$2 heap=$3
  [ -f "$D/diff_$tag.ok" ] && return 0
  rm -rf "$D/v_off_$tag" "$D/v_on_$tag"
  SPARK_GRAFT_QUERIES=q_simjoin_prefix SPARK_DRIVER_MEM=$heap \
    bash tools/runmain.sh graft.Verify "$sfdir" "$D/v_off_$tag" \
    > "$D/v_off_$tag.log" 2>&1 || return 1
  SPARK_GRAFT_SIMJOIN_EXACTDF=true SPARK_GRAFT_QUERIES=q_simjoin_prefix \
  SPARK_DRIVER_MEM=$heap \
    bash tools/runmain.sh graft.Verify "$sfdir" "$D/v_on_$tag" \
    > "$D/v_on_$tag.log" 2>&1 || return 1
  python3 tools/diff_verify.py "$D/v_off_$tag" "$D/v_on_$tag" \
    | tee "$D/diff_$tag.out"
  grep -q "OK: 1/1 identical" "$D/diff_$tag.out" && touch "$D/diff_$tag.ok"
}

diffat /root/testdata/sf0.1 sf01 16g || exit 2
diffat sfgen/sf10 sf10 48g || exit 2

run sfgen/sf10 sf10_sampled 64g false || exit 1
run sfgen/sf10 sf10_exact   64g true  || exit 1
# the 5M-doc leg: attempt under the guard; a kill/failure is recorded,
# not fatal — the committed crossover analysis covers either outcome
run sfgen/sf100docs k1000_sampled 96g false || true
run sfgen/sf100docs k1000_exact   96g true  || true

python3 - "$D" "$OUT" <<'EOF'
import json, sys, os
d, out = sys.argv[1], sys.argv[2]
def q(tag):
    p = f"{d}/{tag}.json"
    if not os.path.exists(p):
        err = ""
        if os.path.exists(f"{d}/{tag}.stderr"):
            err = open(f"{d}/{tag}.stderr").read()[-400:]
        return {"completed": False, "tail": err}
    v = json.load(open(p))["queries"]["q_simjoin_prefix"]
    r = {k: v.get(k) for k in ("sec", "cpu_s", "run_s", "spill_mb", "steal_s")}
    r["completed"] = True
    return r
legs = {t: q(t) for t in
        ["sf10_sampled", "sf10_exact", "k1000_sampled", "k1000_exact"]}
guard_log = ""
if os.path.exists(f"{d}/guard.log"):
    guard_log = open(f"{d}/guard.log").read().strip()
rec = {
 "record": "r16 exact-df A/B after the single-node rework (bounded-heap "
           "smallest_k prefix aggregate, no collect_list regroup): "
           "q_simjoin_prefix sampled vs exact, one JVM per leg, disk-"
           "guarded. Bit-identity asserted at sf0.1 AND sf10 via "
           "diff_verify inside this run.",
 "commit": os.popen("git rev-parse HEAD").read().strip(),
 "flag": "spark.graft.simjoin.exactDf / SPARK_GRAFT_SIMJOIN_EXACTDF",
 "bit_identity_sf0.1": open(f"{d}/diff_sf01.out").read().strip(),
 "bit_identity_sf10": open(f"{d}/diff_sf10.out").read().strip(),
 "disk_guard_events": guard_log,
 "legs": legs,
}
if legs["sf10_exact"]["completed"] and legs["sf10_sampled"]["completed"]:
    rec["overhead_ratio_sf10"] = round(
        legs["sf10_exact"]["sec"] / legs["sf10_sampled"]["sec"], 2)
if legs["k1000_exact"]["completed"] and legs["k1000_sampled"]["completed"]:
    rec["overhead_ratio_k1000"] = round(
        legs["k1000_exact"]["sec"] / legs["k1000_sampled"]["sec"], 2)
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: v for k, v in rec.items()
                  if k.startswith("overhead") or k == "disk_guard_events"}))
EOF
