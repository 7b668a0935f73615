#!/bin/bash
# Template-storm oracle replay (r14 verdict stretch item 8): generate
# the boilerplate-heavy corpus (TemplateStormGen — junk digest
# agreement j ~ 0.6, six times the width-3 junk-cut calibration), run
# the heavy-bucket refinement users over it, and hash-compare each
# against the brute-force DuckDB oracle. A PASS is a RECALL PROOF at
# high j: the oracle is exact, so any true pair the width-3 anchor (or
# the width-2 pigeonhole, or the banding est-filter) dropped would
# hash-mismatch. Output: bench_baselines/r15_template_storm_oracle.json
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r15_template_storm_oracle.json}
DIR=sfgen/templatestorm
VOUT=$(mktemp -d /tmp/stormverify.XXXX)
# the refinement users: width-3 (q_simjoin_prefix) + the width-2
# minhash funnel family that shares the storm's heavy buckets. The two
# CLOSURE oracles go straight to the sampled wave: their DuckDB replay
# of C(2000,2)x16-band verify work spills past this host's /tmp at the
# full storm (measured ENOSPC on the first r15 run) — the r10
# sampled-oracle form at :20 keeps ~250-doc buckets (still >3x the
# heavy cap, refinement engaged on both sides) and a feasible oracle.
QUERIES=${QUERIES:-q_simjoin_prefix,q_dedup_minhash_pairs,q_dup_component_sizes}
SAMPLED_QUERIES=${SAMPLED_QUERIES:-q_dedup_minhash,q_component_labels}

bash tools/runmain.sh graft.tools.TemplateStormGen /root/testdata/sf0.001 "$DIR" || exit 1
for t in region nation customer supplier part orders lineitem events; do
  ln -sf "/root/testdata/sf0.001/$t.parquet" "$DIR/$t.parquet"
done
ln -sf "/root/testdata/sf0.001/embeddings.parquet" "$DIR/embeddings.parquet"

presplit() { # voutdir queries
  python3 - "$1" "$2" <<'PYEOF'
import json, sys
vout, qs = sys.argv[1], set(sys.argv[2].split(","))
allq = sorted(json.load(open(f"{vout}/oracle_sql.json")))
with open(f"{vout}/resume.log", "w") as f:
    for n in allq:
        if n not in qs: f.write(f"PASS {n} (presplit)\n")
PYEOF
}

SPARK_GRAFT_QUERIES="$QUERIES" SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} \
  bash tools/runmain.sh graft.Verify "$DIR" "$VOUT" || exit 1
presplit "$VOUT" "$QUERIES"
COMPARE_RESUME_LOG="$VOUT/resume.log" COMPARE_MEM=16GB COMPARE_THREADS=16 \
  python3 tools/compare_oracle.py "$DIR" "$VOUT" 1200 | tee "$VOUT/compare.log"
CMP=$?

# Wave 2 (sampled-oracle, the r10 form): SAMPLED_QUERIES plus any
# oracle-resource kill from wave 1.
RETRY=$(
  { grep -E "^FAILING .*oracle subprocess" "$VOUT/compare.log" \
      | awk '{print $2}' | sed 's/:$//'; echo "$SAMPLED_QUERIES" | tr , '\n'; } \
  | sort -u | grep . | paste -sd,)
if [ -n "$RETRY" ]; then
  SAMPLE="documents:doc_id:20"
  V2=$(mktemp -d /tmp/stormverify2.XXXX)
  SPARK_GRAFT_TBL_SAMPLE="$SAMPLE" SPARK_GRAFT_QUERIES="$RETRY" \
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} \
    bash tools/runmain.sh graft.Verify "$DIR" "$V2" || exit 1
  presplit "$V2" "$RETRY"
  COMPARE_TBL_SAMPLE="$SAMPLE" COMPARE_RESUME_LOG="$V2/resume.log" \
  COMPARE_MEM=16GB COMPARE_THREADS=16 \
    python3 tools/compare_oracle.py "$DIR" "$V2" 1200 | tee "$V2/compare.log"
  CMP2=$?
  # merge: a sampled PASS supersedes the full-corpus resource kill
  python3 - "$VOUT" "$V2" "$RETRY" <<'PYEOF'
import sys
vout, v2, retry = sys.argv[1], sys.argv[2], set(sys.argv[3].split(","))
lines = open(f"{vout}/compare.log").readlines()
sampled_pass = {l.split()[1] for l in open(f"{v2}/compare.log")
                if l.startswith("PASS ") and "(presplit)" not in l
                and "(resumed" not in l}
with open(f"{vout}/compare.log", "w") as f:
    for l in lines:
        name = l.split()[1].rstrip(":") if len(l.split()) > 1 else ""
        if name in sampled_pass and l.startswith(("FAIL", "FAILING")):
            continue
        f.write(l)
    for n in sorted(sampled_pass):
        f.write(f"PASS {n} (sampled oracle documents:doc_id:20)\n")
PYEOF
  [ "$CMP2" -ne 0 ] && CMP=1
fi

python3 - "$VOUT/compare.log" "$OUT" "$CMP" "$QUERIES,$SAMPLED_QUERIES" <<'EOF'
import json, sys, glob
log, out, cmp_rc, queries = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
passes, fails, sampled = [], [], []
for line in open(log):
    if "(presplit)" in line or "(resumed" in line: continue
    if line.startswith("PASS "):
        passes.append(line.split()[1])
        if "(sampled oracle" in line: sampled.append(line.split()[1])
    elif line.startswith("FAIL "): fails.append(line.rstrip()[:300])
    elif line.startswith(("SKIP ", "NODUMP ")):
        fails.append(f"FAIL {line.split()[1]}: {line.split()[0]} in storm replay")
# recall context: how many verified pairs did the engine emit, and how
# many are the planted storm-copy pairs (id_a>=20000 and id_b>=30000)?
import duckdb
con = duckdb.connect()
planted = con.sql(
    f"SELECT count(*) FROM '{sys.argv[1].rsplit('/',1)[0]}/q_simjoin_prefix/*.parquet' "
    "WHERE id_b >= 30000 AND id_a = id_b - 10000").fetchone()[0]
total = con.sql(
    f"SELECT count(*) FROM '{sys.argv[1].rsplit('/',1)[0]}/q_simjoin_prefix/*.parquet'"
).fetchone()[0]
rec = {
 "record": "r15 template-storm oracle replay (r14 stretch item 8): "
           "2000-doc boilerplate storm (pairwise Jaccard ~0.6 => junk "
           "digest agreement j~0.6, 6x the width-3 junk-cut calibration) "
           "+ 60 planted true pairs riding the same heavy buckets; the "
           "heavy-bucket refinement users hash-compared against the "
           "exact DuckDB oracle on the identical corpus. A pass IS the "
           "recall proof at high j — any anchor/pigeonhole/est-filter "
           "drop of a true pair would hash-mismatch.",
 "corpus": "sfgen/templatestorm (TemplateStormGen, seed-free)",
 "queries": queries.split(","),
 "n_pass": len(passes), "n_fail": len(fails), "fails": fails,
 "sampled_oracle": sampled,
 "simjoin_pairs_total": total,
 "simjoin_planted_pairs_found": planted,
 "planted_expected": 60,
 "green": cmp_rc == 0 and not fails and planted == 60,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in
      ["n_pass", "n_fail", "simjoin_pairs_total",
       "simjoin_planted_pairs_found", "green"]}))
sys.exit(0 if rec["green"] else 1)
EOF
