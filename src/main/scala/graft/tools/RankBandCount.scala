package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: size of the sampled rank bands (c >= 2 / 4 / 8) for the
  * simjoin rank map at a given corpus — the broadcast-cap sizing data.
  * `runMain graft.tools.RankBandCount <sfDir...>`
  */
object RankBandCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val h = graft.sources.Tables.spreadForKernel(docs)
        .filter(substring(md5(concat(lit("rankmap:"),
          col("doc_id").cast("string"))), 1, 2) < lit("0d"))
        .select(explode(array_distinct(
          graft.functions.exprs.gram_hashes64(col("text"), 12))).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
        .selectExpr("count(*) as v1",
          "sum(case when c >= 2 then 1 else 0 end) as v2",
          "sum(case when c >= 4 then 1 else 0 end) as v4",
          "sum(case when c >= 8 then 1 else 0 end) as v8",
          "max(c) as cmax").head()
      println(s"DIR=$dir sampledVocab=${h.getAs[Number](0)} c2=${h.getAs[Number](1)} " +
        s"c4=${h.getAs[Number](2)} c8=${h.getAs[Number](3)} cmax=${h.getAs[Number](4)}")
    }
    spark.stop()
  }
}
