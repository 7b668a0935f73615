#!/bin/bash
# Streaming docs throughput pass (r12 verdict item 6). The r12 probe
# sustained 3.2 MB/s at maxFilesPerTrigger=8: with ~0.9 MB parquet
# files that is ~8 input splits per micro-batch on a 32-core host (4x
# under-parallelized) and 100 batches' worth of trigger overhead
# (p50 trigger 2.4 s vs 4.7 s wall/batch). This sweeps the admission
# size — larger triggers parallelize the scan+score across all cores
# and amortize per-trigger overhead; the scoring kernels are unchanged.
# All three r12 gates (complete, agg_equals_batch, state_bounded) must
# hold at every point; the record carries the full sweep.
# Output: bench_baselines/r13_docs_stream_probe.json
set -u
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r13_docs_stream_probe.json}
DIR=${2:-sfgen/sf100docs}
POINTS=${POINTS:-32 64 128 256}
D=$(mktemp -d /tmp/docsstream.XXXX)
echo "stream sweep dir: $D"

for mf in $POINTS; do
  SPARK_GRAFT_STREAM_MAXFILES=$mf SPARK_DRIVER_MEM=48g \
    bash tools/runmain.sh graft.streaming.DocsStreamProbe "$DIR" "$D/mf$mf.json" \
    > "$D/mf$mf.stdout" 2> "$D/mf$mf.stderr" || { echo "mf=$mf failed"; exit 1; }
done

python3 - "$D" "$OUT" "$POINTS" <<'EOF'
import json, sys
d, out, points = sys.argv[1], sys.argv[2], [int(p) for p in sys.argv[3].split()]
sweep, best = {}, None
for mf in points:
    r = json.load(open(f"{d}/mf{mf}.json"))
    ok = all(r["gates"].values())
    sweep[mf] = {k: r[k] for k in ["wall_s", "batches", "docs_per_sec",
                 "text_mb_per_sec", "trigger_p50_ms", "trigger_p95_ms",
                 "state_rows_max"]} | {"gates_green": ok}
    if ok and (best is None or r["text_mb_per_sec"] > sweep[best]["text_mb_per_sec"]):
        best = mf
rec = {
 "record": "r13 docs-stream throughput pass: maxFilesPerTrigger sweep of "
           "the 5M-doc file-source replay through the E125 score-on-arrival "
           "stack (same corpus, kernels, and gates as the r12 probe, which "
           "sustained 3.2 MB/s at maxFiles=8 — ~8 input splits/batch on 32 "
           "cores plus 100 triggers of admission overhead).",
 "r12_baseline": {"maxfiles": 8, "text_mb_per_sec": 3.2, "wall_s": 470.2},
 "sweep": {str(k): v for k, v in sweep.items()},
 "best": {"maxfiles": best, **(sweep[best] if best else {})},
 "speedup_vs_r12": round(sweep[best]["text_mb_per_sec"] / 3.2, 1) if best else None,
 "green": best is not None and all(v["gates_green"] for v in sweep.values()),
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({"green": rec["green"], "best_maxfiles": best,
                  "best_mb_s": sweep[best]["text_mb_per_sec"] if best else None,
                  "speedup_vs_r12": rec["speedup_vs_r12"]}))
sys.exit(0 if rec["green"] else 1)
EOF
