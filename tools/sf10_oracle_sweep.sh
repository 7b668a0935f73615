#!/bin/bash
# Full-surface sf10 oracle sweep (r10 verdict item 5): every registered
# query dumped by Verify at sfgen/sf10 and hash-compared against DuckDB
# on the same parquet. The pair-funnel drivers (documents / embeddings /
# supplier) are subset by the SHARED md5 table-sample predicate — the
# r10 sampled-oracle mechanism, proven equal-selection by FitCapCheck —
# so the brute-force-replay family stays DuckDB-tractable while every
# OTHER table (60M-row lineitem included) runs FULL at sf10.
# Output: bench_baselines/r13_sf10_oracle_sweep.json
# pipefail: without it, `compare | tee` reports TEE's exit code — the
# r13 first run had the compare parent OOM-killed mid-query and the
# builder still saw rc=0 (and 7 queries silently missing; the builder
# now also counts dumped-but-never-compared queries as holes).
set -u -o pipefail
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r13_sf10_oracle_sweep.json}
SF=${2:-sfgen/sf10}
SAMPLE=${SAMPLE:-documents:doc_id:20,embeddings:vec_id:20,supplier:s_suppkey:20}
TIMEOUT=${TIMEOUT:-180}
# SWEEP_VOUT: reuse a prior run's dump dir (the Verify dump is ~50 min
# at sf10; a compare-side failure should not force a re-dump)
VOUT=${SWEEP_VOUT:-$(mktemp -d /tmp/sf10sweep.XXXX)}

# staleness guard (r13 ADVICE): a reused dump dir produced by an OLDER
# build would be hash-compared against the CURRENT build's regenerated
# oracle_sql.json — passes/fails reflecting neither build. Stamp the
# dump dir with the git commit at Verify time; refuse a mismatched
# reuse unless SWEEP_ALLOW_STALE=1 (for deliberate cross-build A/Bs).
HEAD=$(git rev-parse HEAD)
if [ -f "$VOUT/oracle_sql.json" ]; then
  STAMP=$(cat "$VOUT/commit.txt" 2>/dev/null || echo "unstamped")
  if [ "$STAMP" != "$HEAD" ] && [ "${SWEEP_ALLOW_STALE:-0}" != "1" ]; then
    echo "sf10_oracle_sweep: reused dump dir $VOUT was produced at commit" >&2
    echo "  $STAMP but HEAD is $HEAD — a compare would reflect neither" >&2
    echo "  build. Re-dump (unset SWEEP_VOUT) or set SWEEP_ALLOW_STALE=1." >&2
    exit 8
  fi
else
  SPARK_GRAFT_TBL_SAMPLE="$SAMPLE" SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
    bash tools/runmain.sh graft.Verify "$SF" "$VOUT" || exit 1
  echo "$HEAD" > "$VOUT/commit.txt"
fi

COMPARE_TBL_SAMPLE="$SAMPLE" COMPARE_RESUME_LOG="$VOUT/resume.log" \
COMPARE_MEM=${COMPARE_MEM:-24GB} COMPARE_THREADS=${COMPARE_THREADS:-16} \
  python3 tools/compare_oracle.py "$SF" "$VOUT" "$TIMEOUT" | tee "$VOUT/compare.log"
CMP=$?

python3 - "$VOUT/compare.log" "$OUT" "$CMP" "$SAMPLE" "$TIMEOUT" "$VOUT" <<'EOF'
import json, sys, os
log, out, cmp_rc, sample, tmo, vout = (sys.argv[1], sys.argv[2],
    int(sys.argv[3]), sys.argv[4], sys.argv[5], sys.argv[6])
passes, fails, skips = [], [], []
for line in open(log):
    if line.startswith("PASS "): passes.append(line.split()[1])
    elif line.startswith("FAIL "): fails.append(line.rstrip()[:300])
    elif line.startswith("SKIP "): skips.append(line.split()[1])
    # a full sweep dumps every registered query — an oracle entry with
    # no dump means Verify crashed on it, a failure
    elif line.startswith("NODUMP "):
        fails.append(f"FAIL {line.split()[1]}: never dumped (Verify crashed?)")
# a query that was dumped but produced NO compare line means the compare
# process died mid-run (e.g. OOM) — a hole, not a pass
dumped = {d for d in os.listdir(vout) if d.startswith("q_")}
missing = sorted(dumped - set(passes) - set(skips)
                 - {f.split()[1].rstrip(":") for f in fails})
for m in missing:
    fails.append(f"FAIL {m}: never compared (compare process died mid-run)")
rec = {
 "record": "full-surface sf10 oracle sweep: all registered queries "
           "dumped at sfgen/sf10 (500k docs / 200k embeddings / 60M-row "
           "lineitem scale) and hash-compared in DuckDB; the pair-funnel "
           "tables subset by the shared md5 sample predicate so the "
           "replay family stays oracle-tractable, all other tables FULL",
 "commit": os.popen("git rev-parse HEAD").read().strip(),
 "sample": sample, "oracle_timeout_s": int(tmo),
 "n_pass": len(passes), "n_fail": len(fails),
 "n_oracle_timeout_skip": len(skips), "skipped": skips, "fails": fails,
 # rc 2 = timeouts-but-no-fails: the documented SKIP outcome for
 # brute-force oracles at scale, still green
 "green": cmp_rc in (0, 2) and not fails,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in
      ["n_pass", "n_fail", "n_oracle_timeout_skip", "green"]}))
sys.exit(0 if rec["green"] else 1)
EOF
