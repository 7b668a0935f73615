package graft

import org.apache.spark.sql.functions._
import graft.ops.Observe
import graft.sources.Tables

class ObservabilitySpec extends SparkSpecBase {

  test("observed quality metrics ride the query's own job and match a direct agg") {
    val li = Tables.lineitem(spark, Sf001)
    val (observed, obs) = Observe.qualityMetrics(li, Seq("l_quantity", "l_discount"))

    // the business query the metrics piggyback on
    val revenue = observed.filter(col("l_discount") > 0.02)
      .agg(sum(col("l_extendedprice")).as("rev"))
      .collect().head.getDouble(0)
    assert(revenue > 0.0)

    val m = obs.get
    // oracle: the same stats computed the expensive way (a second scan)
    val d = li.agg(
      count(lit(1)), sum(when(col("l_quantity").isNull, 1L).otherwise(0L)),
      min(col("l_quantity")), max(col("l_quantity")),
      sum(when(col("l_discount").isNull, 1L).otherwise(0L)),
      min(col("l_discount")), max(col("l_discount"))).collect().head
    assert(m("rows") === d.getLong(0))
    assert(m("l_quantity_nulls") === d.getLong(1))
    assert(m("l_quantity_min") === d.get(2))
    assert(m("l_quantity_max") === d.get(3))
    assert(m("l_discount_nulls") === d.getLong(4))
    assert(m("l_discount_min") === d.get(5))
    assert(m("l_discount_max") === d.get(6))
    // the metrics see PRE-filter rows: attach point semantics
    assert(m("rows").asInstanceOf[Long] > li.filter(col("l_discount") > 0.02).count())
  }

  test("schema evolution: mergeSchema unions versions, missing columns read as null") {
    val root = "/tmp/graft-evolve"
    val orders = Tables.orders(spark, Sf0001)
    // v1 writer: three columns
    orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$root/v=1")
    // v2 writer: adds a column
    orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$root/v=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet ===
      Set("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "v"))
    val n = orders.count()
    assert(merged.count() === 2 * n)
    // v1 rows surface the evolved column as null, v2 rows carry values
    assert(merged.filter(col("v") === 1 && col("o_orderdate").isNull).count() === n)
    assert(merged.filter(col("v") === 2 && col("o_orderdate").isNull).count() === 0L)
  }
}
