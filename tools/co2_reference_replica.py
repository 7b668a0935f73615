#!/usr/bin/env python3
"""The reference pipeline's OWN numbers (r16 fidelity capstone,
driver-side tooling): project-co2.py's compute replicated verbatim in
PySpark — same ingest options, same na.drop chain, same change/
isReduced arithmetic, k=5 KMeans FIT ON THE SEEDED 10% SAMPLE with
Spark-ML's default-seed behavior (the reference's exact lines 48/65),
same clusterInfo/facts prints — minus the matplotlib/geopandas surface
that can't run headless here. Output: one JSON blob the record builder
places beside the engine's numbers.

Run: PYTHONHASHSEED=0 python3 tools/co2_reference_replica.py \
       /root/reference/co2-dataset-edited.csv /tmp/co2_ref.json
(PYTHONHASHSEED pinned because pyspark's HasSeed default is
hash(class-name) — Python string-hash randomization would otherwise
make the reference's default-seed fit itself unreproducible.)
"""
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql.functions import col, asc, desc, sum as ssum, when

csv_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/co2-dataset-edited.csv"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/co2_ref.json"

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("WARN")

# project-co2.py:87-89
co2 = (spark.read.option("inferSchema", "true").option("header", "true")
       .csv(csv_path)
       .select("Country Name", "Country Code", "2004", "2014"))
# project-co2.py:25-29
co2 = co2.na.drop("all")
co2 = co2.na.drop("all", subset=("2004", "2014"))
co2 = co2.na.drop("any")
# project-co2.py:101-105
co2 = co2.withColumn("change", col("2014") - col("2004"))
co2 = co2.withColumn("isReduced", col("change") <= 0)

# project-co2.py:34-76 (clustering; final fit on the 10% sample, k=5,
# default seed — the reference's exact lines)
from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import VectorAssembler

vec = VectorAssembler(inputCols=["change", "isReduced"], outputCol="features")
df_kmeans = vec.transform(co2.withColumn("isReduced", col("isReduced").cast("double")))
model = KMeans().setK(5).setFeaturesCol("features").setPredictionCol("cluster") \
    .fit(df_kmeans.sample(False, 0.1, seed=42))
preds = model.transform(df_kmeans)
centers = [list(map(float, c)) for c in model.clusterCenters()]

# project-co2.py:130-133
from pyspark.sql.functions import min as smin, max as smax, count as scount
info = (preds.groupBy("cluster")
        .agg(smin("change").alias("min_change"), smax("change").alias("max_change"),
             scount("*").alias("n_countries"))
        .sort("cluster").collect())
cluster_summary = [
    {"cluster": r["cluster"], "min_change": r["min_change"],
     "max_change": r["max_change"],
     "label": f"{round(r['min_change'], 3)} - {round(r['max_change'], 3)}",
     "n_countries": r["n_countries"]} for r in info]

def top3(c, ascending):
    rows = (co2.orderBy(asc(c) if ascending else desc(c)).limit(3)
            .select("Country Name", col(c).cast("double")).collect())
    return [[r[0], r[1]] for r in rows]

facts = {
    "top3_2004": top3("2004", False), "bottom3_2004": top3("2004", True),
    "top3_2014": top3("2014", False), "bottom3_2014": top3("2014", True),
    "top3_reduction": top3("change", True), "top3_increase": top3("change", False),
    "n_reduced": co2.filter(col("isReduced")).count(),
    "n_increased": co2.filter(~col("isReduced")).count(),
    "sum_change_reduced": co2.filter(col("isReduced")).agg(ssum("change")).collect()[0][0],
    "sum_change_increased": co2.filter(~col("isReduced")).agg(ssum("change")).collect()[0][0],
    "sum_change_total": co2.agg(ssum("change")).collect()[0][0],
}

json.dump({
    "pipeline": "project-co2.py replicated verbatim (PySpark; k=5 fit on "
                "sample(0.1, seed=42) with default KMeans seed, "
                "PYTHONHASHSEED=0)",
    "n_countries": co2.count(),
    "cluster_summary": cluster_summary,
    "centers": centers,
    "facts": facts,
}, open(out, "w"), indent=1)
print(f"wrote {out}")
spark.stop()
