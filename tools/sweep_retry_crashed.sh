#!/bin/bash
# Sequential retry wave for oracle children that CRASHED in the split
# sweep (three concurrent DuckDB processes collided on the shared
# cwd-relative .tmp spill dir — fixed in compare_oracle.py with
# per-process temp dirs; the retry also runs one-at-a-time with a
# bigger memory budget so genuine resource kills are separated from
# the collision artifact). Appends to $VOUT/compareB9.log, which the
# sweep builder merges (a PASS here supersedes the earlier crash).
# Usage: VOUT=<dumpdir> bash tools/sweep_retry_crashed.sh q_a q_b ...
set -u
cd "$(dirname "$0")/.."
VOUT=${VOUT:?need VOUT}
SF=${SF:-sfgen/sf10}
SAMPLE=${SAMPLE:-documents:doc_id:20,embeddings:vec_id:20,supplier:s_suppkey:20}
TIMEOUT=${TIMEOUT:-1200}
for q in "$@"; do
  python3 - "$VOUT" "$q" <<'PYEOF'
import json, sys
vout, q = sys.argv[1], sys.argv[2]
names = sorted(json.load(open(f"{vout}/oracle_sql.json")))
with open(f"{vout}/resume_retry.log", "w") as f:
    for n in names:
        if n != q: f.write(f"PASS {n} (presplit)\n")
PYEOF
  echo "=== retry $q (mem=${COMPARE_MEM:-40GB} t=${TIMEOUT}s) ==="
  COMPARE_TBL_SAMPLE="$SAMPLE" COMPARE_RESUME_LOG="$VOUT/resume_retry.log" \
  COMPARE_MEM=${COMPARE_MEM:-40GB} COMPARE_THREADS=${COMPARE_THREADS:-24} \
    python3 tools/compare_oracle.py "$SF" "$VOUT" "$TIMEOUT" 2>&1 \
    | grep -vE "\(resumed|rows-only" | tee -a "$VOUT/compareB9.log"
done
