package graft

import org.apache.spark.sql.functions._
import graft.ops.PeriodChange

class PeriodChangeSpec extends SparkSpecBase {
  import spark.implicits._

  // long-form: entity, year, value — entity 1 reduced, 2 increased, 3 incomplete
  private def longForm = Seq(
    ("e1", 2004, 10.50), ("e1", 2004, 5.25), ("e1", 2014, 8.00),
    ("e2", 2004, 3.00), ("e2", 2014, 9.99),
    ("e3", 2004, 1.00)
  ).toDF("entity", "yr", "v")

  private def change = PeriodChange.changeBetween(
    longForm, Seq("entity"), col("yr"), col("v"), 2004, 2014)

  test("changeBetween pivots, sums exactly, flags reduction") {
    val rows = change.orderBy("entity")
      .select("entity", "v0", "v1", "change", "is_reduced")
      .as[(String, Double, Double, Double, Boolean)].collect()
    assert(rows === Array(
      ("e1", 15.75, 8.00, -7.75, true),
      ("e2", 3.00, 9.99, 6.99, false)))
  }

  test("incomplete entities are dropped (na.drop('any') analog)") {
    assert(!change.select("entity").as[String].collect().contains("e3"))
  }

  test("topMovers is deterministic with tiebreak") {
    val top = PeriodChange.topMovers(change, "change", descending = true, 1, "entity")
    assert(top.select("entity").as[String].head() === "e2")
  }

  test("sumByFlag splits counts and exact sums") {
    val rows = PeriodChange.sumByFlag(change)
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSet === Set((true, 1L, -7.75), (false, 1L, 6.99)))
  }

  test("rangeLabels formats min - max per group") {
    val labeled = PeriodChange.rangeLabels(
      change.withColumn("cluster", lit(0)), "cluster", "change")
    val row = labeled.head()
    assert(row.getAs[String]("label") === "-7.750 - 6.990")
  }
}
