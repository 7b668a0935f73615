#!/bin/bash
# r16 (r15 verdict item 1): re-measure the q_embed_neardup emission
# curve under the occupancy-targeted planes schedule + occupancy CAP
# (Dedup.embeddingBuckets splitOcc=16) across the 400k -> 4M -> 40M
# decade, with planted-pair recall at the two verify-feasible sizes.
# Legs run in SEPARATE JVMs; the 40M stats are further chunked by
# table range (shuffle files are retained until app exit — 14 tables
# of 560M skinny bucket rows in one JVM exceeds this one-volume
# host's headroom; chunk seeds/indices are global, so the summed
# stats are bitwise the single-run values).
# Output: bench_baselines/r16_embed_neardup_probe.json
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r16_embed_neardup_probe.json}
D=${PROBE_DIR:-/tmp/embedprobe16}
mkdir -p "$D"
run() { # mem args... > log
  local mem=$1 log=$2; shift 2
  SPARK_DRIVER_MEM=$mem bash tools/runmain.sh \
    graft.tools.EmbedNeardupProbe "$@" > "$D/$log" 2>&1
  echo "$log rc=$?"
}
[ -f "$D/leg_400k.json" ] || run 48g leg_400k.log sfgen/sf10 "$D/leg_400k.json" 1 false
[ -f "$D/leg_4m.json" ]   || run 80g leg_4m.log sfgen/sf100docs "$D/leg_4m.json" 1 false
# 40M: emission-only, three table chunks, fresh JVM each
for R in 0-4 5-9 10-15; do
  [ -f "$D/leg_40m_$R.json" ] || \
    run 80g "leg_40m_$R.log" sfgen/sf100docs "$D/leg_40m_$R.json" 10 true "$R"
done

python3 - "$D" "$OUT" <<'EOF'
import json, sys, os, glob
d, out = sys.argv[1], sys.argv[2]
legs = {}
for name in ("leg_400k", "leg_4m"):
    legs[name.replace("leg_", "")] = json.load(open(f"{d}/{name}.json"))
# sum the 40m chunks
chunks = [json.load(open(p)) for p in sorted(glob.glob(f"{d}/leg_40m_*.json"))]
assert chunks, "no 40m chunks"
seen = [t["t"] for c in chunks for t in c["per_table"]]
assert sorted(seen) == list(range(chunks[0]["tables"])), \
    f"40m chunks do not cover all tables: {sorted(seen)}"
per_table = sorted((t for c in chunks for t in c["per_table"]),
                   key=lambda t: t["t"])
legs["40m"] = {
    "n": chunks[0]["n"], "rep": chunks[0]["rep"],
    "schedule": chunks[0]["schedule"], "tables": chunks[0]["tables"],
    "mean_occ": round(sum(t["mean_occ"] for t in per_table)
                      / len(per_table), 2),
    "total_emission_pairs": sum(t["emission_pairs"] for t in per_table),
    "verified_pairs": -1, "planted_found": -1,
    "chunked_stats": [c["stats_tables"] for c in chunks],
    "per_table": per_table,
}
e4, e40 = (legs["400k"]["total_emission_pairs"],
           legs["4m"]["total_emission_pairs"])
e400 = legs["40m"]["total_emission_pairs"]
import math
rec = {
 "record": "r16 q_embed_neardup decade probe under the occupancy cap "
           "(splitOcc=16, extraBits=2 recall model): pre-filter pair "
           "emission and planted-pair recall across 400k/4M/40M "
           "self-join vectors. r15 (no cap): 38.3M -> 750.3M, 19.6x "
           "per decade (n^1.29).",
 "commit": os.popen("git rev-parse HEAD").read().strip(),
 "legs": legs,
 "curve": {
   "decade1_ratio": round(e40 / e4, 2),
   "decade1_exponent": round(math.log10(e40 / e4), 3),
   "decade2_ratio": round(e400 / e40, 2),
   "decade2_exponent": round(math.log10(e400 / e40), 3),
 },
 "recall": {
   "400k": legs["400k"]["planted_found"] / legs["400k"]["planted_pairs"],
   "4m": legs["4m"]["planted_found"] / legs["4m"]["planted_pairs"],
 },
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps(rec["curve"]), json.dumps(rec["recall"]))
EOF
