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
# operating-point p95 bound (ms): the r13 verdict asked for a chosen
# operating point with its latency bound stated, not just the
# max-throughput corner (14.3 MB/s at p50 31.8 s is a throughput
# record, not a latency a curator would accept for steady ingest)
P95_BOUND_MS=${P95_BOUND_MS:-15000}
D=$(mktemp -d /tmp/docsstream.XXXX)
echo "stream sweep dir: $D"

for mf in $POINTS; do
  SPARK_GRAFT_STREAM_MAXFILES=$mf SPARK_DRIVER_MEM=48g \
    bash tools/runmain.sh graft.streaming.DocsStreamProbe "$DIR" "$D/mf$mf.json" \
    > "$D/mf$mf.stdout" 2> "$D/mf$mf.stderr" || { echo "mf=$mf failed"; exit 1; }
done

python3 - "$D" "$OUT" "$POINTS" "$P95_BOUND_MS" <<'EOF'
import json, sys
d, out = sys.argv[1], sys.argv[2]
points = [int(p) for p in sys.argv[3].split()]
p95_bound = int(sys.argv[4])
sweep, best, op = {}, None, None
for mf in points:
    r = json.load(open(f"{d}/mf{mf}.json"))
    ok = all(r["gates"].values())
    sweep[mf] = {k: r[k] for k in ["wall_s", "batches", "docs_per_sec",
                 "text_mb_per_sec", "trigger_p50_ms", "trigger_p95_ms",
                 "state_rows_max"]} | {"gates_green": ok}
    if ok and (best is None or r["text_mb_per_sec"] > sweep[best]["text_mb_per_sec"]):
        best = mf
    # operating point: max throughput SUBJECT TO the p95 latency bound
    if ok and r["trigger_p95_ms"] <= p95_bound and (
            op is None or r["text_mb_per_sec"] > sweep[op]["text_mb_per_sec"]):
        op = mf
rec = {
 "record": "r14 docs-stream rate-vs-latency frontier: maxFilesPerTrigger "
           "sweep of the 5M-doc file-source replay through the E125 "
           "score-on-arrival stack (gates complete/agg_equals_batch/"
           "state_bounded hold at every point). The r13 record was the "
           "max-throughput corner; this publishes the full frontier plus "
           "a chosen OPERATING point (max rate subject to the stated "
           "trigger-p95 bound) so a curator picks latency, not luck.",
 "r13_record": {"maxfiles": 256, "text_mb_per_sec": 14.3,
                "trigger_p50_ms": 31800},
 "p95_bound_ms": p95_bound,
 "sweep": {str(k): v for k, v in sweep.items()},
 "max_throughput": {"maxfiles": best, **(sweep[best] if best else {})},
 "operating_point": ({"maxfiles": op, **sweep[op]} if op is not None else
                     {"note": f"no point met p95 <= {p95_bound} ms"}),
 "green": best is not None and all(v["gates_green"] for v in sweep.values()),
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({"green": rec["green"], "best_maxfiles": best,
                  "best_mb_s": sweep[best]["text_mb_per_sec"] if best else None,
                  "operating_maxfiles": op}))
sys.exit(0 if rec["green"] else 1)
EOF
