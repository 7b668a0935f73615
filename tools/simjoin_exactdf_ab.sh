#!/bin/bash
# r15 (r14 verdict item 5): A/B the distributed EXACT-DF rank path
# (spark.graft.simjoin.exactDf / SPARK_GRAFT_SIMJOIN_EXACTDF) against
# the default sampled broadcast rank map for q_simjoin_prefix, at sf10
# (500k docs) and k1000 (5M docs), one JVM per leg (the r13 isolation
# discipline). Bit-identity of the final pair set under both paths is
# asserted at sf0.1 via Verify + diff_verify.py inside this script, so
# the record carries its own correctness witness.
#
# The record's crossover analysis: the sampled map caps at 2M entries;
# the probe prints the rank-map entry count at each corpus (from the
# same aggregate the query runs) so the "coverage band narrows with
# vocabulary" claim gets measured numbers — the flag is the documented
# escape hatch once the df>=2 sampled vocabulary outgrows the cap.
set -u
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r15_simjoin_exactdf_ab.json}
D=${PROBE_DIR:-$(mktemp -d /tmp/sjexact.XXXX)}
echo "probe dir: $D"

run() { # sfdir tag heap exact
  local sfdir=$1 tag=$2 heap=$3 exact=$4
  [ -f "$D/$tag.json" ] && return 0
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_QUERIES=q_simjoin_prefix \
  SPARK_DRIVER_MEM=$heap SPARK_GRAFT_SIMJOIN_EXACTDF=$exact \
    bash tools/runmain.sh graft.Bench > "$D/$tag.stdout" 2> "$D/$tag.stderr" \
    || return 1
  mv bench_full.json "$D/$tag.json"
}

# bit-identity witness at sf0.1 (cheap, fresh dumps)
if [ ! -f "$D/diff.ok" ]; then
  rm -rf "$D/v_off" "$D/v_on"
  SPARK_GRAFT_QUERIES=q_simjoin_prefix SPARK_DRIVER_MEM=16g \
    bash tools/runmain.sh graft.Verify /root/testdata/sf0.1 "$D/v_off" \
    > "$D/v_off.log" 2>&1 || exit 1
  SPARK_GRAFT_SIMJOIN_EXACTDF=true SPARK_GRAFT_QUERIES=q_simjoin_prefix \
  SPARK_DRIVER_MEM=16g \
    bash tools/runmain.sh graft.Verify /root/testdata/sf0.1 "$D/v_on" \
    > "$D/v_on.log" 2>&1 || exit 1
  python3 tools/diff_verify.py "$D/v_off" "$D/v_on" | tee "$D/diff.out"
  grep -q "OK: 1/1 identical" "$D/diff.out" && touch "$D/diff.ok" || exit 2
fi

run sfgen/sf10      sf10_sampled   64g false || exit 1
run sfgen/sf10      sf10_exact     64g true  || exit 1
run sfgen/sf100docs k1000_sampled  96g false || exit 1
run sfgen/sf100docs k1000_exact    96g true  || exit 1

python3 - "$D" "$OUT" <<'EOF'
import json, sys, os
d, out = sys.argv[1], sys.argv[2]
def q(tag):
    v = json.load(open(f"{d}/{tag}.json"))["queries"]["q_simjoin_prefix"]
    return {k: v.get(k) for k in ("sec", "cpu_s", "run_s", "spill_mb", "steal_s")}
legs = {t: q(t) for t in
        ["sf10_sampled", "sf10_exact", "k1000_sampled", "k1000_exact"]}
rec = {
 "record": "exact-df rank path A/B (r14 verdict item 5): q_simjoin_prefix "
           "under the default sampled broadcast rank map vs the flagged "
           "distributed exact-df join form, one JVM per leg, same host "
           "back-to-back. Output bit-identity under both paths asserted "
           "at sf0.1 (diff_verify) as part of this run.",
 "commit": os.popen("git rev-parse HEAD").read().strip(),
 "flag": "spark.graft.simjoin.exactDf / SPARK_GRAFT_SIMJOIN_EXACTDF",
 "bit_identity_sf0.1": open(f"{d}/diff.out").read().strip(),
 "legs": legs,
 "overhead_ratio": {
   "sf10": round(legs["sf10_exact"]["sec"] / legs["sf10_sampled"]["sec"], 2),
   "k1000": round(legs["k1000_exact"]["sec"] / legs["k1000_sampled"]["sec"], 2),
 },
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps(rec["overhead_ratio"]))
EOF
