package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-engine check of the PORTABLE fit-sample funnel at a scale
  * where the 100k cap ENGAGES (r10, closes the r9 medium advisory):
  * prints, for each fit draw tag, the engine's selected-sample count
  * and an order-free checksum (sum of xxhash64(id) as decimal) after
  * draw + cap. The companion DuckDB query (same md5 predicates — see
  * Similarity.capFitSample's scaladoc) must produce identical numbers;
  * equal count+checksum ⇒ identical id SETS, hence identical codebook
  * fits downstream (the Lloyd itself is already replay-proven at
  * sf0.01/sf1 end-to-end).
  *
  * `runMain graft.tools.FitCapCheck [sfDir] [thrHex]`
  */
object FitCapCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/sfgen/sf10")
    val thr = args.lift(1).getOrElse("80")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("neighbor_id"))
    for (tag <- Seq("pqfit", "ivfpqfit", "ivffit")) {
      val draw = embs.filter(substring(
        md5(concat(lit(tag + ":"), col("neighbor_id").cast("string"))), 1, 2)
        < lit(thr))
      val capped = graft.ops.Similarity.capFitSample(draw, "neighbor_id")
      // checksum both engines can compute identically: 48-bit md5 slice
      // per id, exact integer sum
      val r = capped.agg(
        count(lit(1)).as("n"),
        sum(conv(substring(md5(concat(lit("ck:"),
            col("neighbor_id").cast("string"))), 1, 12), 16, 10)
          .cast("decimal(38,0)")).cast("string").as("checksum")).collect()(0)
      println(s"FITCAP tag=$tag thr=$thr n=${r.getLong(0)} checksum=${r.getString(1)}")
    }
    spark.stop()
  }
}
