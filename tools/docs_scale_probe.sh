#!/bin/bash
# Third-decade funnel probe (r10 verdict task 1): the doc/embedding
# funnel family at k=1000 (5M docs / 2M embeddings, ScaleGenDocs from
# the sf0.1 base) vs a SAME-SESSION-CONDITIONS fresh sf10 pass (500k /
# 200k), so the published ratios compare two runs on the same host
# minutes apart rather than against a record from a different round.
# Output: bench_baselines/r12_docs_k1000.json with per-query ratios.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_baselines/r12_docs_k1000.json}
QUERIES="q_dedup_exact,q_dedup_minhash,q_dedup_minhash_pairs,q_simjoin_prefix,q_embed_neardup,q_semdedup,q_component_labels,q_substring_dup,q_containment,q_ann_topk,q_ann_ivf,q_ann_ivf_recall,q_ann_ivfpq,q_ann_ivfpq_recall,q_dedup_simhash_pairs,q_token_budget"
# PROBE_DIR: pass a prior run's tmpdir to resume — a leg whose json
# already exists is not re-run (each leg is 13-60 min).
D=${PROBE_DIR:-$(mktemp -d /tmp/docsprobe.XXXX)}
echo "probe dir: $D"

# ScaleGenDocs writes only documents/embeddings; Bench's warmup reads
# lineitem unconditionally, so link the sf0.1 star tables in (none of
# the probed queries touch them).
for t in region nation customer supplier part orders lineitem events; do
  [ -e "sfgen/sf100docs/$t.parquet" ] || \
    ln -s "/root/testdata/sf0.1/$t.parquet" "sfgen/sf100docs/$t.parquet"
done

run() { # sfdir outjson heap
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_QUERIES="$QUERIES" SPARK_DRIVER_MEM=$3 \
    bash tools/runmain.sh graft.Bench > "$D/$2.stdout" 2> "$D/$2.stderr" || return 1
  mv bench_full.json "$D/$2.json"
}

[ -f "$D/sf10.json" ]  || run sfgen/sf10      sf10  64g || exit 1
[ -f "$D/k1000.json" ] || run sfgen/sf100docs k1000 96g || exit 1

python3 - "$D" "$OUT" <<'EOF'
import json, sys
d, out = sys.argv[1], sys.argv[2]
def load(p):
    return json.load(open(f"{d}/{p}.json"))["queries"]
s10, s1000 = load("sf10"), load("k1000")
qs, sup, errs = {}, [], []
for q in sorted(s1000):
    a, b = s10.get(q, {}), s1000[q]
    if "err" in b: errs.append(q)
    r = round(b["sec"] / a["sec"], 2) if a.get("sec") else None
    qs[q] = {"sf10_sec": a.get("sec"), "k1000_sec": b.get("sec"),
             "ratio_10x": r, "cpu_s": b.get("cpu_s"), "run_s": b.get("run_s")}
    if "err" in b: qs[q]["err"] = b["err"]
    # superlinear flag: >1.3x headroom over the 10x data growth on a
    # query that is large enough for the ratio to be signal (>2 s)
    if r and r > 13.0 and b["sec"] > 2.0: sup.append(q)
rec = {
 "record": "r12 third-decade funnel probe (post bucket-refine/shared-funnel/adaptive-partition fixes): docs/embeddings at k=1000 "
           "(5M docs / 2M embeddings, ScaleGenDocs from sf0.1) vs fresh "
           "same-host sf10 pass (500k / 200k); data growth exactly 10x",
 "rows": {"documents": 5000000, "embeddings": 2000000},
 "config": {"master": "local[32]", "heap_sf10": "64g", "heap_k1000": "96g",
            "shuffle_partitions": 32, "sink": "noop"},
 "sf10_total_sec": round(sum(v["sec"] for v in s10.values() if "sec" in v), 1),
 "k1000_total_sec": round(sum(v["sec"] for v in s1000.values() if "sec" in v), 1),
 "n_queries": len(qs), "n_err": len(errs), "superlinear": sup,
 "queries": qs,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in
      ["sf10_total_sec", "k1000_total_sec", "n_err", "superlinear"]}))
sys.exit(1 if errs else 0)
EOF
