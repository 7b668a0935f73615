package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a query's formatted physical plan (post-AQE re-optimization is
  * not shown; this is the static plan). `runMain graft.tools.ExplainQuery
  * <query> [sfDir]`.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q_simjoin_prefix")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(query)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
