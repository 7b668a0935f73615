#!/bin/bash
# Shared-JVM cpu-inflation hunt (r13 verdict item 3): reproduce the
# "later identical work burns 1.6-2x cpu_s after the 2M-vector ANN
# shortlist queries" effect inside ONE JVM (InflationProbe: target
# query x reps before/after the ANN trigger set, per-rep process-CPU +
# GC time/count + old-gen attribution), then A/B the JVM/allocator
# hypotheses the r13 verdict named:
#   base      — stock flags (G1, no pretouch), the shape that inflated
#   control   — no ANN trigger phase (rules out rep-count drift)
#   pretouch  — -XX:+AlwaysPreTouch (page-fault / lazy-commit suspect)
#   parallel  — -XX:+UseParallelGC (G1-specific behavior suspect)
#   arena     — MALLOC_ARENA_MAX=2 (glibc native-arena fragmentation)
#   gclog     — base + -Xlog:gc (names the GC pattern for the record)
# Output: bench_baselines/r14_inflation_hunt.json
set -u
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r14_inflation_hunt.json}
DIR=${2:-sfgen/sf100docs}
TARGET=${TARGET:-q_token_budget}
REPS=${REPS:-2}
ANN=${ANN:-q_ann_lsh,q_ann_ivf,q_ann_ivfpq}
HEAP=${HEAP:-96g}
D=$(mktemp -d /tmp/inflation.XXXX)
echo "hunt dir: $D"

run() { # name jvm_extra env_extra ann
  local name=$1 extra=$2 envx=$3 ann=$4
  [ -f "$D/$name.json" ] && return 0
  env $envx GRAFT_JVM_EXTRA="$extra" SPARK_DRIVER_MEM=$HEAP \
    bash tools/runmain.sh graft.tools.InflationProbe "$DIR" "$TARGET" "$REPS" \
      "$ann" "$D/$name.json" > "$D/$name.stdout" 2> "$D/$name.stderr" \
    || { echo "$name failed"; tail -5 "$D/$name.stderr"; return 1; }
}

run base     ""                                "IGNORE=1" "$ANN" || exit 1
run control  ""                                "IGNORE=1" "none" || exit 1
run pretouch "-XX:+AlwaysPreTouch"             "IGNORE=1" "$ANN" || exit 1
run parallel "-XX:+UseParallelGC"              "IGNORE=1" "$ANN" || exit 1
run arena    ""                                "MALLOC_ARENA_MAX=2" "$ANN" || exit 1
run gclog    "-Xlog:gc:file=$D/gclog.txt"      "IGNORE=1" "$ANN" || exit 1

python3 - "$D" "$OUT" "$TARGET" <<'EOF'
import json, sys, glob, os
d, out, target = sys.argv[1], sys.argv[2], sys.argv[3]
configs = {}
for f in glob.glob(f"{d}/*.json"):
    name = os.path.basename(f)[:-5]
    r = json.load(open(f))
    before = [x for x in r["reps"] if x["phase"] == "before"][-1:]
    after = [x for x in r["reps"] if x["phase"] == "after"]
    b = before[0] if before else None
    def calib_norm(x):
        # cpu_s normalized by the rep's host-speed calibration loop:
        # raw cpu_s comparisons are invalid across host speed-mode flips
        # (r14 measured 2.2-3.6x per-core swings at ~0 steal)
        return x["cpu_s"] / x["calib_ms"] if x.get("calib_ms") else None
    configs[name] = {
        "jvm_flags": r.get("jvm_flags"),
        "before_last": b,
        "after": after,
        "cpu_inflation_raw": (round(sum(a["cpu_s"] for a in after) / len(after)
                          / b["cpu_s"], 2) if b and after else None),
        "cpu_inflation_calibrated": (
            round(sum(calib_norm(a) for a in after) / len(after)
                  / calib_norm(b), 2)
            if b and after and calib_norm(b)
            and all(calib_norm(a) for a in after) else None),
        "steal_s_after": ([a.get("steal_s") for a in after] if after else None),
        "gc_s_before": b["gc_s"] if b else None,
        "gc_s_after_mean": (round(sum(a["gc_s"] for a in after) / len(after), 2)
                            if after else None),
    }
gclog = f"{d}/gclog.txt"
summary = {
 "record": "r14 shared-JVM cpu-inflation hunt: InflationProbe runs the "
           "target query before/after the 2M-vector ANN shortlist trigger "
           "set in one JVM, per-rep process-CPU/GC/old-gen; configs split "
           "the allocator/GC/page-fault hypothesis space",
 "target": target, "configs": configs,
 "gclog_lines": (sum(1 for _ in open(gclog)) if os.path.exists(gclog) else 0),
}
json.dump(summary, open(out, "w"), indent=1)
print(json.dumps({k: {"raw": v["cpu_inflation_raw"],
                      "calibrated": v["cpu_inflation_calibrated"]}
                  for k, v in configs.items()}))
EOF
