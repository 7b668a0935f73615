package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Statistics-driven planning: table/column stats from ANALYZE are what
  * let the planner pick broadcast sides and join orders WITHOUT hints on
  * a real cluster (file size alone lies once filters apply). This pins
  * (a) stats actually land in the catalog, and (b) the planner consumes
  * them — a filtered dim whose POST-FILTER row count fits the broadcast
  * threshold gets broadcast even though the raw table would not.
  */
class CboStatsSpec extends SparkSpecBase {

  test("ANALYZE TABLE stats flow into the catalog and drive broadcast planning") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    Tables.orders(spark, Sf001).write.saveAsTable("cbo_orders")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_orderstatus")

      val cat = spark.sql("DESCRIBE EXTENDED cbo_orders").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(cat("Statistics").contains("rows"),
        s"row count must be recorded: ${cat("Statistics")}")

      // threshold smaller than the full table, bigger than the filtered
      // slice — only SELECTIVITY ESTIMATION from column stats can
      // justify the broadcast. The predicate is a RANGE (estimable from
      // min/max stats); an opaque expression like `% 1000 = 0` has no
      // stats-derived selectivity and keeps the conservative plan.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100KB")
      val dim = spark.table("cbo_orders").filter(col("o_orderkey") < 150)
        .select(col("o_orderkey"))
      val fact = Tables.lineitem(spark, Sf001)
      val plan = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"stats + selectivity must broadcast the filtered dim:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
    }
  }
}
