#!/bin/bash
# Third-decade funnel probe (r10 verdict task 1; r13 adds recall gates,
# per-query spill, and the staged-funnel leg): the doc/embedding funnel
# family at k=1000 (5M docs / 2M embeddings, ScaleGenDocs from the
# sf0.1 base) vs a SAME-SESSION-CONDITIONS fresh sf10 pass (500k /
# 200k), so the published ratios compare two runs on the same host
# minutes apart rather than against a record from a different round.
#
# r13 additions (r12 verdict items 3, 5, 7):
#  - ANN RECALL GATES: the three recall queries are dumped via Verify at
#    the 2M-vector corpus and their mean recall is asserted against the
#    SURVEY floors (lsh >= 0.8, ivf >= 0.9, ivfpq >= 0.8) — the k1000
#    record now proves recall holds at scale, not just wall time.
#  - PER-QUERY SPILL: bench_full's spill_mb is copied into the record.
#  - STAGED-FUNNEL LEG: the k1000 bench leg runs with
#    SPARK_GRAFT_FUNNEL_DIR set, so the pair funnel is written once as
#    a staging table; a FRESH JVM then re-runs the funnel-consumer
#    queries reading that table — measuring q_component_labels et al.
#    WITHOUT the build cost (the cross-session reuse story, measured).
# Output: bench_baselines/r13_docs_k1000.json with per-query ratios.
set -u
cd "$(dirname "$0")/.."
source tools/load_preflight.sh
OUT=${1:-bench_baselines/r13_docs_k1000.json}
# QUERIES is overridable for focused re-measurement runs (e.g. r14's
# superlinearity-fix evidence re-ran the funnel family only; the full
# r13 record stands for the rest — the record text must say which)
QUERIES=${QUERIES:-q_dedup_exact,q_dedup_minhash,q_dedup_minhash_pairs,q_simjoin_prefix,q_embed_neardup,q_semdedup,q_component_labels,q_substring_dup,q_containment,q_ann_topk,q_ann_ivf,q_ann_ivf_recall,q_ann_ivfpq,q_ann_ivfpq_recall,q_ann_lsh,q_ann_lsh_recall,q_dedup_simhash_pairs,q_token_budget}
FUNNEL_CONSUMERS="q_component_labels,q_dedup_minhash,q_dedup_minhash_pairs,q_dedup_exact"
RECALL_QUERIES="q_ann_lsh_recall,q_ann_ivf_recall,q_ann_ivfpq_recall"
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

run() { # sfdir outjson heap queries — ONE BENCH JVM PER QUERY (r13):
  # the shared-JVM legs cross-contaminated: after the corpus-fraction
  # ANN shortlists (100k-entry buffers at 2M vectors), every LATER query
  # in the same process ran ~1.6-2x the CPU for identical work
  # (q_component_labels 351 s in-suite vs 183-218 s alone, cpu_s
  # doubling with zero spill; not the boxed heap — fixed — and not the
  # JIT code cache — tested at 1g). Per-query JVMs measure each query's
  # own scaling, which is what the probe's ratios exist to compare, and
  # match the fresh-executor posture of a real per-job cluster.
  local sfdir=$1 out=$2 heap=$3 queries=$4
  rm -f "$D/$out".q_*.json
  for q in ${queries//,/ }; do
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

[ -f "$D/sf10.json" ]  || run sfgen/sf10 sf10 64g "$QUERIES" || exit 1
# k1000 leg populates the funnel staging table as a side effect
[ -f "$D/k1000.json" ] || \
  SPARK_GRAFT_FUNNEL_DIR="$D/funnel" \
  run sfgen/sf100docs k1000 96g "$QUERIES" || exit 1
# fresh JVM, same staging dir: funnel consumers WITHOUT the build
[ -f "$D/k1000_staged.json" ] || \
  SPARK_GRAFT_FUNNEL_DIR="$D/funnel" \
  run sfgen/sf100docs k1000_staged 96g "$FUNNEL_CONSUMERS" || exit 1
# recall values at the 2M-vector corpus (Verify dump -> parquet)
[ -d "$D/recall" ] || \
  SPARK_GRAFT_QUERIES="$RECALL_QUERIES" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  bash tools/runmain.sh graft.Verify sfgen/sf100docs "$D/recall" \
    > "$D/recall.stdout" 2> "$D/recall.stderr" || exit 1

python3 - "$D" "$OUT" "$QUERIES" <<'EOF'
import json, sys, glob
import duckdb
d, out = sys.argv[1], sys.argv[2]
queries_env = sys.argv[3]
def load(p):
    return json.load(open(f"{d}/{p}.json"))["queries"]
s10, s1000, staged = load("sf10"), load("k1000"), load("k1000_staged")
qs, sup, errs = {}, [], []
for q in sorted(s1000):
    a, b = s10.get(q, {}), s1000[q]
    if "err" in b: errs.append(q)
    r = (round(b["sec"] / a["sec"], 2)
         if a.get("sec") and b.get("sec") else None)
    qs[q] = {"sf10_sec": a.get("sec"), "k1000_sec": b.get("sec"),
             "ratio_10x": r, "cpu_s": b.get("cpu_s"), "run_s": b.get("run_s"),
             "spill_mb": b.get("spill_mb", 0.0),
             # hypervisor steal during each leg (r14 telemetry): a
             # nonzero column taints that side's wall time — the sf10
             # leg of this record was re-run after a 5-core steal burst
             # was caught red-handed by exactly this column
             "steal_s": b.get("steal_s", 0.0),
             "sf10_steal_s": a.get("steal_s", 0.0)}
    if q in staged and "sec" in staged[q]:
        qs[q]["staged_sec"] = staged[q]["sec"]
    if "err" in b: qs[q]["err"] = b["err"]
    # superlinear flag: >1.3x headroom over the 10x data growth on a
    # query that is large enough for the ratio to be signal (>2 s)
    if r and r > 13.0 and b.get("sec", 0) > 2.0: sup.append(q)
# ANN recall floors at 2M vectors (SURVEY E7/E18/E108 promises)
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
 "record": "third-decade funnel probe: docs/embeddings at k=1000 "
           "(5M docs / 2M embeddings, ScaleGenDocs from sf0.1) vs fresh "
           "same-host sf10 pass (500k / 200k); data growth exactly 10x. "
           "ANN recall gates at 2M vectors, per-query spill/steal, and "
           "the staged-funnel leg (fresh JVM re-running the funnel "
           "consumers from the cross-session staging table). The QUERIES "
           "env names the measured set — a focused run re-measures the "
           "changed family and the prior full record stands for the rest.",
 "queries_env": queries_env,
 "rows": {"documents": 5000000, "embeddings": 2000000},
 "config": {"master": "local[32]", "heap_sf10": "64g", "heap_k1000": "96g",
            "shuffle_partitions": 32, "sink": "noop"},
 "sf10_total_sec": round(sum(v["sec"] for v in s10.values() if "sec" in v), 1),
 "k1000_total_sec": round(sum(v["sec"] for v in s1000.values() if "sec" in v), 1),
 "staged_leg_total_sec": round(sum(v["sec"] for v in staged.values() if "sec" in v), 1),
 "n_queries": len(qs), "n_err": len(errs), "superlinear": sup,
 "recall_at_2m": recall, "recall_floors_green": recall_ok,
 "queries": qs,
}
json.dump(rec, open(out, "w"), indent=1)
print(json.dumps({k: rec[k] for k in
      ["sf10_total_sec", "k1000_total_sec", "staged_leg_total_sec",
       "n_err", "superlinear", "recall_floors_green"]}))
sys.exit(1 if (errs or not recall_ok) else 0)
EOF
