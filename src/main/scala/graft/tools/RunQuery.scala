package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one query and show its full result — quick inspection without
  * the bench/verify machinery. `runMain graft.tools.RunQuery <query>
  * [sfDir]`.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q_ann_ivf_sweep")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(query)(spark, sfDir).show(200, false)
    spark.stop()
  }
}
