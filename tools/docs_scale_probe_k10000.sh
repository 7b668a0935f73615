#!/bin/bash
# Fourth-decade funnel probe (r13 verdict item 5): the staged-funnel
# leg + ANN recall gates at 50M docs / 20M embeddings (ScaleGenDocs
# k=10000 from sf0.1), ratioed against a SAME-SESSION-CONDITIONS fresh
# k=1000 pass (5M / 2M) — data growth exactly 10x, fourth decade.
#
# Scope (logged, not silent): the probed set is the staged-funnel
# family + ANN recall + the linear curation kernels. q_simjoin_prefix
# and q_semdedup are EXCLUDED at this decade on this host — their
# staged intermediates (~7 GB and ~5 GB at 5M docs) scale past the
# host's free disk at 50M; their third-decade ratios are the committed
# k1000 record's.  Output: bench_baselines/r14_docs_k10000.json
set -u
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r14_docs_k10000.json}
QUERIES="q_dedup_exact,q_dedup_minhash,q_component_labels,q_token_budget,q_ann_ivf_recall,q_ann_ivfpq_recall,q_ann_lsh_recall"
FUNNEL_CONSUMERS="q_component_labels,q_dedup_minhash,q_dedup_exact"
RECALL_QUERIES="q_ann_lsh_recall,q_ann_ivf_recall,q_ann_ivfpq_recall"
D=${PROBE_DIR:-$(mktemp -d /tmp/docsprobe10k.XXXX)}
echo "probe dir: $D"

# generate the 50M-doc corpus once (gitignored; ~14 GB)
if [ ! -d sfgen/sf500docs/documents.parquet ]; then
  SPARK_DRIVER_MEM=48g bash tools/runmain.sh graft.tools.ScaleGenDocs \
    /root/testdata/sf0.1 sfgen/sf500docs 10000 || exit 1
fi
for t in region nation customer supplier part orders lineitem events; do
  [ -e "sfgen/sf500docs/$t.parquet" ] || \
    ln -s "/root/testdata/sf0.1/$t.parquet" "sfgen/sf500docs/$t.parquet"
done

run() { # sfdir outjson heap queries — one Bench JVM per query (the
  # r13 probe isolation: per-query JVMs measure each query's own
  # scaling and match a per-job cluster's fresh-executor posture)
  local sfdir=$1 out=$2 heap=$3 queries=$4
  for q in ${queries//,/ }; do
    [ -f "$D/$out.$q.json" ] && continue
    SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_QUERIES="$q" SPARK_DRIVER_MEM=$heap \
      bash tools/runmain.sh graft.Bench >> "$D/$out.stdout" 2>> "$D/$out.stderr" \
      || return 1
    mv bench_full.json "$D/$out.$q.json"
  done
  python3 - "$D" "$out" <<'PYEOF'
import json, sys, glob
d, out = sys.argv[1], sys.argv[2]
qs = {}
for f in glob.glob(f"{d}/{out}.q_*.json"):
    qs.update(json.load(open(f))["queries"])
json.dump({"queries": qs, "isolation": "one JVM per query"},
          open(f"{d}/{out}.json", "w"))
PYEOF
}

# fresh k1000 reference pass, same host minutes apart
[ -f "$D/k1000.json" ] || \
  SPARK_GRAFT_FUNNEL_DIR="$D/funnel1k" \
  run sfgen/sf100docs k1000 96g "$QUERIES" || exit 1
# fourth decade: 50M docs / 20M vectors
[ -f "$D/k10000.json" ] || \
  SPARK_GRAFT_FUNNEL_DIR="$D/funnel10k" \
  run sfgen/sf500docs k10000 96g "$QUERIES" || exit 1
# fresh JVM, same staging dir: funnel consumers WITHOUT the build
[ -f "$D/k10000_staged.json" ] || \
  SPARK_GRAFT_FUNNEL_DIR="$D/funnel10k" \
  run sfgen/sf500docs k10000_staged 96g "$FUNNEL_CONSUMERS" || exit 1
# recall values at the 20M-vector corpus (corpus-fraction shortlists)
[ -d "$D/recall" ] || \
  SPARK_GRAFT_QUERIES="$RECALL_QUERIES" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  bash tools/runmain.sh graft.Verify sfgen/sf500docs "$D/recall" \
    > "$D/recall.stdout" 2> "$D/recall.stderr" || exit 1

python3 - "$D" "$OUT" <<'EOF'
import json, sys, glob
import duckdb
d, out = sys.argv[1], sys.argv[2]
def load(p):
    return json.load(open(f"{d}/{p}.json"))["queries"]
s1k, s10k, staged = load("k1000"), load("k10000"), load("k10000_staged")
qs, sup, errs = {}, [], []
for q in sorted(s10k):
    a, b = s1k.get(q, {}), s10k[q]
    if "err" in b: errs.append(q)
    r = (round(b["sec"] / a["sec"], 2)
         if a.get("sec") and b.get("sec") else None)
    qs[q] = {"k1000_sec": a.get("sec"), "k10000_sec": b.get("sec"),
             "ratio_10x": r, "cpu_s": b.get("cpu_s"),
             "spill_mb": b.get("spill_mb", 0.0)}
    if q in staged and "sec" in staged[q]:
        qs[q]["staged_sec"] = staged[q]["sec"]
    if "err" in b: qs[q]["err"] = b["err"]
    if r and r > 13.0 and b.get("sec", 0) > 2.0: sup.append(q)
floors = {"q_ann_lsh_recall": 0.8, "q_ann_ivf_recall": 0.9,
          "q_ann_ivfpq_recall": 0.8}
con = duckdb.connect()
recall, recall_ok = {}, True
for q, floor in floors.items():
    files = glob.glob(f"{d}/recall/{q}/*.parquet")
    if not files:
        recall[q] = {"err": "no dump"}; recall_ok = False; continue
    mn, mean = con.sql(
        f"SELECT min(recall), avg(recall) FROM read_parquet('{d}/recall/{q}/*.parquet')"
    ).fetchone()
    ok = mean >= floor
    recall[q] = {"mean": round(mean, 3), "min": round(mn, 3),
                 "floor": floor, "ok": ok}
    recall_ok = recall_ok and ok
rec = {
 "record": "r14 fourth-decade funnel probe: staged-funnel family + ANN "
           "recall gates at 50M docs / 20M embeddings (ScaleGenDocs "
           "k=10000) vs a fresh same-host k=1000 pass; growth exactly "
           "10x. Excluded at this decade on this host (disk): "
           "q_simjoin_prefix, q_semdedup — third-decade ratios stand in "
           "the k1000 record.",
 "rows": {"documents": 50000000, "embeddings": 20000000},
 "config": {"master": "local[32]", "heap": "96g",
            "shuffle_partitions": 32, "sink": "noop"},
 "k1000_total_sec": round(sum(v["sec"] for v in s1k.values() if "sec" in v), 1),
 "k10000_total_sec": round(sum(v["sec"] for v in s10k.values() if "sec" in v), 1),
 "staged_leg_total_sec": round(sum(v["sec"] for v in staged.values() if "sec" in v), 1),
 "n_queries": len(qs), "n_err": len(errs), "superlinear": sup,
 "recall_at_20m": recall, "recall_floors_green": recall_ok,
 "queries": qs,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in
      ["k1000_total_sec", "k10000_total_sec", "staged_leg_total_sec",
       "n_err", "superlinear", "recall_floors_green"]}))
sys.exit(1 if (errs or not recall_ok) else 0)
EOF
