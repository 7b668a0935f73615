package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: for the given gram hashes, print full df, sampled df
  * (the rank pass's filter), and PREFIX occupancy — pins down why the
  * top prefix buckets are invisible to the rank map.
  * `runMain graft.tools.GramDfCheck <sfDir> <pg1,pg2,...>`
  */
object GramDfCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("sfgen/sf10")
    val pgs = args.lift(1).getOrElse("2516285594203901149").split(",").map(_.toLong)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val srcDocs = graft.sources.Tables.documents(s, dir)
    val set = pgs.toSet
    val isTarget = udf((g: Long) => set.contains(g))
    val grams = graft.sources.Tables.spreadForKernel(srcDocs)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.exprs.gram_hashes64(col("text"), 12))).as("g"))
      .filter(isTarget(col("g")))
    val agg = grams.groupBy(col("g")).agg(
      count(lit(1)).as("df"),
      sum(when(pmod(xxhash64(col("doc_id")), lit(20)) === 0, 1L)
        .otherwise(0L)).as("sampled_df"),
      min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .collect()
    agg.foreach(r => println(s"pg=${r.getLong(0)} df=${r.getLong(1)} " +
      s"sampled_df=${r.getLong(2)} min_doc=${r.getLong(3)} max_doc=${r.getLong(4)}"))
    // how is the doc-sample filter distributed over these docs?
    val n = srcDocs.count()
    val ns = srcDocs.filter(pmod(xxhash64(col("doc_id")), lit(20)) === 0).count()
    println(s"docs=$n sampled=$ns rate=${ns.toDouble / n}")
    spark.stop()
  }
}
