#!/bin/bash
# Concurrent-session contention record (r10 verdict item 7): N query
# streams multiplexed over one SparkContext at sf1, FAIR-scheduled,
# every result hash-compared against a same-JVM single-stream reference
# pass. Green = no deadlock, no cross-session result corruption, and a
# published multiplexing throughput factor.
# Output: bench_baselines/r12_concurrent_sf1.json (r12: query list
# extended with the heavy funnel family + shared PairFunnel consumers)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r12_concurrent_sf1.json}
SF=${2:-sfgen/sf1}
STREAMS=${3:-6}

LINE=$(SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
  bash tools/runmain.sh graft.tools.ConcurrentBench "$SF" "$STREAMS" 2>/tmp/concurrent.err \
  | grep '"streams"' | tail -1)
if [ -z "$LINE" ]; then
  echo "no JSON line — see /tmp/concurrent.err" >&2
  exit 1
fi
python3 - "$OUT" <<EOF
import json, sys
rec = json.loads('''$LINE''')
rec["record"] = ("r12 concurrent-session contention (16-query streams incl. the heavy funnel family): %d FAIR-scheduled query "
  "streams over one shared SparkContext at sf1 (each stream its own "
  "newSession()), every result order-independent-hash-compared to a "
  "single-stream reference; exercises CacheManager + Staging.stageToDisk "
  "under concurrent sessions" % rec["streams"])
json.dump(rec, open(sys.argv[1], "w"), indent=1)
print(json.dumps({k: rec[k] for k in ["streams", "wall_s", "single_stream_s",
  "throughput_x", "n_mismatch"]}))
EOF
