#!/bin/bash
# Multi-hour kill/restart streaming soak (r11 verdict item 6): the
# bounded-state watermark workload of stream_soak_long.sh run for >=2h
# TOTAL with a REAL mid-run kill — leg A is `kill -9`ed (no stop(), no
# shutdown hooks, RocksDB shot mid-write) after ~KILL_AT seconds, leg B
# restarts from the SAME checkpoint and runs the remaining time to a
# graceful finish. Per-minute series survive the kill via StreamSoak's
# incremental `$out.minutes.jsonl` (r12). Gates:
#   - recovery:  leg B's first batch id > leg A's last (checkpoint
#                resume, not a from-zero restart) AND leg B's early
#                state_rows within [0.5x, 2x] of leg A's steady median
#                (state reloaded, neither reset nor doubled)
#   - rate:      each leg's steady-minute MEAN input >= 95% of nominal
#                (per-minute minimums wobble with trigger/minute-boundary
#                alignment — a delayed batch moves rows across a minute
#                edge; the sustained mean is the honest gate)
#   - eviction:  rows_removed > 0 in every steady minute of BOTH legs
#   - bounded:   final-minute state_rows <= 1.5x combined steady median
#   - flat p95:  leg B's last 5 minutes <= 1.5x leg A's minutes 5-10
# (Leg B's first 4 minutes are excluded from rate/p95 gates: the rate
# source replays the kill/restart gap as a catch-up burst by design.)
# Env: SPARK_GRAFT_SOAK_RATE (120000), KILL_AT (3900), LEG_B_SECS (3900).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r12_streaming_kill2h.json}
D=$(mktemp -d /tmp/soakkill.XXXX)
export SPARK_GRAFT_SOAK_RATE=${SPARK_GRAFT_SOAK_RATE:-120000}
KILL_AT=${KILL_AT:-3900}
LEG_B_SECS=${LEG_B_SECS:-3900}
echo "soak dir: $D (kill at ${KILL_AT}s, leg B ${LEG_B_SECS}s)"

# leg A: nominal duration far past the kill point; hard-killed
SPARK_GRAFT_SOAK_SECS=36000 \
  bash tools/runmain.sh graft.streaming.StreamSoak watermark "$D" "$D/a.json" \
  > "$D/a.stdout" 2> "$D/a.stderr" &
PID=$!
sleep "$KILL_AT"
kill -9 "$PID" 2>/dev/null
wait "$PID" 2>/dev/null
echo "leg A killed (pid $PID)"
sleep 5

# leg B: SAME state dir -> resumes the checkpoint; graceful finish
SPARK_GRAFT_SOAK_SECS="$LEG_B_SECS" \
  bash tools/runmain.sh graft.streaming.StreamSoak watermark "$D" "$D/b.json" \
  > "$D/b.stdout" 2> "$D/b.stderr" || { echo "leg B failed"; exit 1; }

python3 - "$D" "$OUT" "$SPARK_GRAFT_SOAK_RATE" "$KILL_AT" "$LEG_B_SECS" <<'EOF'
import json, statistics, sys
d, out, rate, kill_at, legb = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
def mins(p):
    return [json.loads(l) for l in open(p) if l.strip()]
a, b = mins(f"{d}/a.json.minutes.jsonl"), mins(f"{d}/b.json.minutes.jsonl")
steady_a = [m for m in a if m["minute"] >= 4]
steady_b = [m for m in b if m["minute"] >= 4 and m["minute"] < b[-1]["minute"]]
steady = steady_a + steady_b
med_state = statistics.median(m["state_rows"] for m in steady)
recovery_ok = (b[0]["batch_id_min"] > a[-1]["batch_id_max"] and
               0.5 * med_state <= b[0]["state_rows"] <= 2.0 * med_state)
def mean_rate(steady):
    return sum(m["input_rows"] for m in steady) / (60.0 * len(steady))
rate_ok = mean_rate(steady_a) >= 0.95 * rate and mean_rate(steady_b) >= 0.95 * rate
evict_ok = all(m["rows_removed"] > 0 for m in steady)
bounded_ok = b[-1]["state_rows"] <= 1.5 * med_state
early = [m["trigger_p95_ms"] for m in a if 5 <= m["minute"] < 10]
late = [m["trigger_p95_ms"] for m in b[-5:]]
p95_ok = statistics.mean(late) <= 1.5 * max(1.0, statistics.mean(early))
rec = {
 "record": ("r12 kill/restart watermark soak: bounded-state windowed "
            "aggregate under RocksDB, leg A kill -9ed mid-stream at "
            f"~{kill_at}s, leg B resumed the same checkpoint for {legb}s "
            "to a graceful stop; per-minute series survived the kill via "
            "the incremental minutes log"),
 "metric": "streaming_watermark_kill_restart_soak",
 "provider": "RocksDBStateStoreProvider",
 "rate": rate,
 "total_minutes": len(a) + len(b),
 "leg_a_minutes": len(a), "leg_b_minutes": len(b),
 "leg_a_last_batch": a[-1]["batch_id_max"],
 "leg_b_first_batch": b[0]["batch_id_min"],
 "median_steady_state_rows": med_state,
 "state_rows_last": b[-1]["state_rows"],
 "gates": {"recovery_ok": recovery_ok, "rate_ok": rate_ok,
           "eviction_ok": evict_ok, "state_bounded": bounded_ok,
           "p95_flat": p95_ok},
 "minutes_a": a, "minutes_b": b,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps(rec["gates"]), "total_min", rec["total_minutes"],
      "a_last_batch", rec["leg_a_last_batch"], "b_first_batch", rec["leg_b_first_batch"])
sys.exit(0 if all(rec["gates"].values()) else 1)
EOF
