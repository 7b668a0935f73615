package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed big-big join and groupBy plan with ZERO exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, Sf0001).select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_custkey", 8)
      Bucketing.writeBucketed(
        Tables.customer(spark, Sf0001).select("c_custkey", "c_name", "c_acctbal"),
        "b_customer", "c_custkey", 8)

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // correctness: identical to the plain parquet join
      val got = joined.select("o_orderkey", "c_custkey").as[(Long, Long)]
        .collect().sorted
      val want = Tables.orders(spark, Sf0001)
        .join(Tables.customer(spark, Sf0001),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey").as[(Long, Long)].collect().sorted
      assert(got === want)

      // aggregation on the bucket key also rides the layout: no exchange
      val aggPlan = spark.table("b_orders").groupBy("o_custkey")
        .agg(sum(col("o_totalprice")))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
