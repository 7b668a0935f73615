package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic (r15): q_token_budget's staged frame `d` should
  * make the quality/token kernel run ONCE (the r13 fix), but
  * StageProfile shows FOUR ~equal heavy kernel stages per run. This
  * prints whether the staged frame is actually registered in the cache
  * and whether the final plan reads InMemoryTableScan or recomputes.
  */
object TokenBudgetCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("token-budget-cache-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import org.apache.spark.sql.functions._
    val d = graft.ops.Staging.stageToDisk(
      graft.sources.Tables.spreadForKernel(
        graft.sources.Tables.documents(spark, sfDir)).select(
        col("doc_id"), col("source"),
        round(graft.ops.TextAnalysis.qualityScore(col("text")) * 10000)
          .cast("long").as("qm"),
        graft.ops.TextAnalysis.tokenCountWs(col("text")).cast("long").as("tok")))
    println(s"storageLevel after stage: ${d.storageLevel}")
    println(s"cache lookup hit: ${
      spark.sharedState.cacheManager.lookupCachedData(
        d.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isDefined}")
    val out = graft.SparkEntry.queries("q_token_budget")(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    val scans = "InMemoryTableScan".r.findAllIn(plan).size
    val kernels = "quality_score".r.findAllIn(plan).size
    println(s"final plan: $scans InMemoryTableScans, $kernels quality_score kernels")
    if (args.length > 1 && args(1) == "plan") println(plan.take(8000))
    spark.stop()
  }
}
