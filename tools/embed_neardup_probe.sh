#!/bin/bash
# r15 (r14 verdict item 4): attribute q_embed_neardup's next decade.
# At 10x data (200k -> 2M vectors) its wall grew 5.52x (r14_docs_k1000)
# — the steepest funnel ratio after simjoin/semdedup. Three legs:
#  - EmbedNeardupProbe at sf10 and sf100docs: derived LSH params
#    (planes/tables), per-table bucket stats, the EXACT pre-filter
#    emission mass (sum C(occ,2)), and verified survivor count — the
#    three cost terms (signatures, bucket exchange, emission) measured
#    separately from the join itself;
#  - StageProfile q_embed_neardup at both corpora (3 reps): per-stage
#    wall/cpu/shuffle attribution of the actual query.
# Output: bench_baselines/r15_embed_neardup_probe.json
set -u -o pipefail
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r15_embed_neardup_probe.json}
D=${PROBE_DIR:-$(mktemp -d /tmp/embedprobe.XXXX)}
echo "probe dir: $D"

[ -f "$D/probe_sf10.log" ] || \
  SPARK_DRIVER_MEM=32g bash tools/runmain.sh graft.tools.EmbedNeardupProbe \
    sfgen/sf10 > "$D/probe_sf10.log" 2> "$D/probe_sf10.err" || exit 1
[ -f "$D/probe_k1000.log" ] || \
  SPARK_DRIVER_MEM=96g bash tools/runmain.sh graft.tools.EmbedNeardupProbe \
    sfgen/sf100docs > "$D/probe_k1000.log" 2> "$D/probe_k1000.err" || exit 1
[ -f "$D/stage_sf10.log" ] || \
  SPARK_DRIVER_MEM=32g bash tools/runmain.sh graft.tools.StageProfile \
    q_embed_neardup sfgen/sf10 3 > "$D/stage_sf10.log" 2> "$D/stage_sf10.err" || exit 1
[ -f "$D/stage_k1000.log" ] || \
  SPARK_DRIVER_MEM=96g bash tools/runmain.sh graft.tools.StageProfile \
    q_embed_neardup sfgen/sf100docs 3 > "$D/stage_k1000.log" 2> "$D/stage_k1000.err" || exit 1

python3 - "$D" "$OUT" <<'EOF'
import json, sys, os, re
d, out = sys.argv[1], sys.argv[2]
def probe(tag):
    txt = open(f"{d}/probe_{tag}.log").read()
    g = lambda p: re.search(p, txt)
    hdr = g(r"n=(\d+) planes=(\d+) tables=(\d+) pTable=([\d.eE+-]+)")
    tables = []
    for m in re.finditer(r"table=(\d+) buckets=(\d+) max_occ=(\d+) "
                         r"mean_occ=([\d.]+) emission_pairs=([\d.E+]+)", txt):
        tables.append({"t": int(m[1]), "buckets": int(m[2]),
                       "max_occ": int(m[3]), "mean_occ": float(m[4]),
                       "emission_pairs": int(float(m[5]))})
    return {
      "n": int(hdr[1]), "planes": int(hdr[2]), "tables": int(hdr[3]),
      "p_table": float(hdr[4]),
      "total_emission_pairs": int(float(g(r"total emission pairs across tables: ([\d.E+]+)")[1])),
      "verified_pairs": int(g(r"verified distinct pairs: (\d+)")[1]),
      "per_table": tables,
    }
def stages(tag):
    rows = []
    for l in open(f"{d}/stage_{tag}.log"):
        m = re.match(r"stage=\s*(\d+) wall=\s*(\d+)ms run=\s*(\d+)ms "
                     r"cpu=\s*(\d+)ms shufR=\s*(\d+)KB shufW=\s*(\d+)KB "
                     r"spill=\s*(\d+)KB tasks=\s*(\d+)", l)
        if m:
            rows.append({"stage": int(m[1]), "wall_ms": int(m[2]),
                         "run_ms": int(m[3]), "cpu_ms": int(m[4]),
                         "shuf_r_kb": int(m[5]), "shuf_w_kb": int(m[6]),
                         "spill_kb": int(m[7]), "tasks": int(m[8])})
        m2 = re.match(r"RUN (\d+) q_embed_neardup: ([\d.]+) s", l)
        if m2: rows.append({"rep": int(m2[1]), "sec": float(m2[2])})
    return rows
rec = {
 "record": "r15 q_embed_neardup decade attribution (r14 verdict item 4): "
           "derived LSH params, exact bucket/emission stats, and per-stage "
           "profile at 400k (sf10) and 4M (k1000) self-join vectors.",
 "commit": os.popen("git rev-parse HEAD").read().strip(),
 "probe": {"sf10": probe("sf10"), "k1000": probe("k1000")},
 "stages": {"sf10": stages("sf10"), "k1000": stages("k1000")},
}
# mechanism summary computed from the numbers
p10, pk = rec["probe"]["sf10"], rec["probe"]["k1000"]
rec["mechanism"] = {
  "bucket_rows_ratio": round((pk["n"] * pk["tables"]) / (p10["n"] * p10["tables"]), 2),
  "emission_ratio": round(pk["total_emission_pairs"]
                          / max(1, p10["total_emission_pairs"]), 2),
  "signature_work_ratio": round((pk["n"] * pk["tables"] * pk["planes"])
                                / (p10["n"] * p10["tables"] * p10["planes"]), 2),
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps(rec["mechanism"]))
EOF
