#!/bin/bash
# RocksDB large-state soak driver: phase 1 (halt()-killed mid-stream)
# and phase 2 (recovery from the same checkpoint) in SEPARATE JVMs,
# then merge + verdict into bench_baselines/r11_streaming_rocksdb.json.
# The 'state larger than heap' gate reads the MEASURED state footprint
# (stateOperators.memoryUsedBytes + the provider's SST-size custom
# metric) from the streaming progress — not an assumed bytes/key
# estimate (r10 advisory).
# Env: SPARK_GRAFT_SOAK_RATE (150000), SPARK_GRAFT_SOAK_SECS (150),
#      SPARK_DRIVER_MEM (4g).
set -u
DIR=$(mktemp -d /tmp/streamsoak.XXXX)
OUT=${1:-bench_baselines/r11_streaming_rocksdb.json}
bash "$(dirname "$0")/runmain.sh" graft.streaming.StreamSoak phase1 "$DIR" "$DIR/p1.json"
# phase1 halt()s by design — ignore its exit code
bash "$(dirname "$0")/runmain.sh" graft.streaming.StreamSoak phase2 "$DIR" "$DIR/p2.json" || exit 1
python3 - "$DIR" "$OUT" <<'EOF'
import json, sys
d, out = sys.argv[1], sys.argv[2]
p1 = json.load(open(f"{d}/p1.json"))
p2 = json.load(open(f"{d}/p2.json"))
rate, secs = p1["rate"], p1["phase_secs"]
def footprint(p):
    # measured native memory + SST bytes on disk; overlapping (block
    # cache holds decompressed SST blocks) but the DISK component alone
    # is what makes state heap-independent, so publish both
    sst = sum(v for k, v in p.get("state_mem_custom", {}).items()
              if "sstfile" in k.lower())
    return {"memory_used_bytes": p.get("state_mem_bytes_last", 0),
            "sst_file_bytes": sst}
f2 = footprint(p2)
state_bytes = max(f2["memory_used_bytes"], f2["sst_file_bytes"])
rec = {
 "metric": "streaming_rocksdb_soak",
 "provider": "RocksDBStateStoreProvider",
 "pipeline": "rate -> groupBy(distinct key).count update-mode -> noop; "
             "phase1 JVM halt()-killed mid-stream; phase2 = new JVM, same checkpoint",
 "rate": rate, "phase_secs": secs, "heap_mb": p1["heap_mb"],
 "phase1": p1, "phase2": p2,
 "recovery": {
  "resumed_past_batch": p2["first_batch_id"] > p1["last_batch_id"],
  "state_preserved": p2["state_rows_first"] >= p1["state_rows_last"],
  "grew_after_restart":
    p2["state_rows_last"] > p2["state_rows_first"] + rate * secs // 2,
 },
 "final_state_rows": p2["state_rows_last"],
 "state_footprint_measured": f2,
 "state_over_heap": state_bytes > p1["heap_mb"] * 1048576,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps(rec["recovery"]), "final_state_rows", rec["final_state_rows"],
      "state_bytes", state_bytes)
ok = all(rec["recovery"].values()) and rec["state_over_heap"]
sys.exit(0 if ok else 1)
EOF
