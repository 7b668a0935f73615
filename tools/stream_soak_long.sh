#!/bin/bash
# Long-haul BOUNDED-state streaming soak (r10 verdict item 4): >=30 min
# sustained at 100k+ rows/s of a WATERMARKED windowed aggregate under
# RocksDB (append mode - emission requires eviction), single JVM.
# Gates, all read off the per-minute measured series (listener-captured,
# no recentProgress truncation):
#   - rate:      measured input >= 95% of nominal
#   - eviction:  rows_removed > 0 in the steady-state minutes
#   - bounded:   last-minute state_rows <= 1.5x the median steady minute
#   - flat p95:  mean p95 of the last 5 minutes <= 1.5x minutes 5-10
# Env: SPARK_GRAFT_SOAK_RATE (120000), SPARK_GRAFT_SOAK_SECS (1860),
#      SPARK_DRIVER_MEM (4g).
set -u
DIR=$(mktemp -d /tmp/streamsoakw.XXXX)
OUT=${1:-bench_baselines/r11_streaming_watermark.json}
export SPARK_GRAFT_SOAK_RATE=${SPARK_GRAFT_SOAK_RATE:-120000}
export SPARK_GRAFT_SOAK_SECS=${SPARK_GRAFT_SOAK_SECS:-1860}
bash "$(dirname "$0")/runmain.sh" graft.streaming.StreamSoak watermark "$DIR" "$DIR/w.json" || exit 1
python3 - "$DIR" "$OUT" <<'EOF'
import json, statistics, sys
d, out = sys.argv[1], sys.argv[2]
w = json.load(open(f"{d}/w.json"))
mins = w["minutes"]
# steady state = skip the first 4 minutes (window fill + watermark lag)
steady = [m for m in mins if m["minute"] >= 4 and m["minute"] < mins[-1]["minute"]]
rate_ok = float(w["in_rows_per_sec"]) >= 0.95 * w["rate"]
evict_ok = all(m["rows_removed"] > 0 for m in steady)
med_state = statistics.median(m["state_rows"] for m in steady) if steady else 0
bounded_ok = bool(steady) and mins[-1]["state_rows"] <= 1.5 * med_state
early = [m["trigger_p95_ms"] for m in mins if 5 <= m["minute"] < 10]
late = [m["trigger_p95_ms"] for m in mins[-5:]]
p95_ok = bool(early and late) and \
    statistics.mean(late) <= 1.5 * max(1.0, statistics.mean(early))
rec = {
 "metric": "streaming_watermark_soak",
 "provider": "RocksDBStateStoreProvider",
 "pipeline": w["pipeline"],
 "rate": w["rate"], "phase_secs": w["phase_secs"], "heap_mb": w["heap_mb"],
 "batches": w["batches"], "input_rows": w["input_rows"],
 "in_rows_per_sec": float(w["in_rows_per_sec"]),
 "trigger_p50_ms": w["trigger_p50_ms"], "trigger_p95_ms": w["trigger_p95_ms"],
 "rows_removed_total": w["rows_removed_total"],
 "state_rows_last": w["state_rows_last"],
 "state_mem_bytes_last": w["state_mem_bytes_last"],
 "state_mem_custom": w["state_mem_custom"],
 "median_steady_state_rows": med_state,
 "gates": {"rate_ok": rate_ok, "eviction_ok": evict_ok,
           "state_bounded": bounded_ok, "p95_flat": p95_ok},
 "minutes": mins,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps(rec["gates"]), "state_rows_last", rec["state_rows_last"],
      "p95", rec["trigger_p95_ms"])
sys.exit(0 if all(rec["gates"].values()) else 1)
EOF
