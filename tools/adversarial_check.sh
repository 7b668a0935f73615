#!/bin/bash
# Adversarial-corpus oracle regression (r10 verdict item 2): generate
# the planted-pathology documents/embeddings variant of sf0.001
# (empty / whitespace-only / single-token / multi-kB-token / non-ASCII
# docs; zero / duplicate / tiny embeddings), run the FULL 197-query
# Verify over it, and hash-compare every oracle in DuckDB on the same
# corpus. Green = the empty-text guard family is regression-tested, not
# just fixed. Output: bench_baselines/r11_adversarial_oracle.json.
# pipefail: without it CMP=$? below captures TEE's exit status, not the
# compare's — a compare that exits 1/2 would read as green (r13 ADVICE)
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r11_adversarial_oracle.json}
DIR=sfgen/adversarial
VOUT=$(mktemp -d /tmp/advverify.XXXX)

bash tools/runmain.sh graft.tools.AdversarialGen /root/testdata/sf0.001 "$DIR" || exit 1
# the star-schema tables are the unmodified sf0.001 singles
for t in region nation customer supplier part orders lineitem events; do
  ln -sf "/root/testdata/sf0.001/$t.parquet" "$DIR/$t.parquet"
done

SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-8g} \
  bash tools/runmain.sh graft.Verify "$DIR" "$VOUT" || exit 1
python3 tools/compare_oracle.py "$DIR" "$VOUT" | tee "$VOUT/compare.log"
CMP=$?

python3 - "$VOUT/compare.log" "$OUT" "$CMP" <<'EOF'
import json, sys
log, out, cmp_rc = sys.argv[1], sys.argv[2], int(sys.argv[3])
passes, fails = [], []
for line in open(log):
    if line.startswith("PASS "): passes.append(line.split()[1])
    elif line.startswith("FAIL "): fails.append(line.rstrip()[:300])
    # this is a FULL-surface regression: every oracle entry must have an
    # engine dump. A NODUMP line means Verify crashed on that query and
    # kept going (it catches per-query exceptions) — count it as a
    # failure, same as sf10_oracle_sweep.sh (r13 ADVICE)
    elif line.startswith("NODUMP "):
        fails.append(f"FAIL {line.split()[1]}: never dumped (Verify crashed?)")
rec = {
 "record": "r11 adversarial-corpus oracle regression: full-surface "
           "Verify + DuckDB compare over sf0.001 documents/embeddings "
           "with planted pathologies (3x empty-text docs, whitespace-only, "
           "single-token incl non-ASCII, 8KiB unbroken tokens, CJK-no-space, "
           "RTL, emoji, combining accents, planted near/exact dup pairs; "
           "zero / duplicate / 1e-6 embeddings)",
 "corpus": "sfgen/adversarial (generator: graft.tools.AdversarialGen, "
           "seed-free fixed rows, ids >= 10000)",
 "n_pass": len(passes), "n_fail": len(fails), "fails": fails,
 "green": cmp_rc == 0 and not fails,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in ["n_pass", "n_fail", "green"]}))
sys.exit(0 if rec["green"] else 1)
EOF
