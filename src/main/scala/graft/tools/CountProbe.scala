package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = graft.sources.Tables.documents(spark, dir)
      // anchor-bucket histogram: how many (hash) buckets with r rows
      val anchors = graft.sources.Tables.spreadForKernel(docs)
        .filter(length(col("text")) >= 40)
        .select(col("doc_id").as("id"),
          explode(graft.functions.exprs.winnow_anchors(
            graft.functions.exprs.gram_hashes64(col("text"), 33), 8)).as("a"))
        .select(col("id"), col("a.h").as("h"))
      val freq = anchors.groupBy("h").agg(count(lit(1)).as("r"))
      val hist = freq.selectExpr("sum(r) as n_anchors", "count(*) as n_buckets",
        "sum(r*(r-1) div 2) as match_pairs", "max(r) as max_bucket").head()
      println(s"DIR=$dir anchors=${hist.getLong(0)} buckets=${hist.getLong(1)} matchpairs=${hist.getAs[Number](2).longValue} maxbucket=${hist.getAs[Number](3).longValue}")
      val spans = graft.ops.Dedup.sharedSubstringSpans(docs, "text", "doc_id", minLen = 40)
      println(s"DIR=$dir span_pairs=${spans.count()}")
    }
    spark.stop()
  }
}
