package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximations: HLL++ cardinality error bound vs the
  * exact count (cross-engine sketches differ, so this is the check the
  * q_approx_distinct query relies on instead of a DuckDB oracle).
  */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("percentile_approx(accuracy=10000) lands within 1% of the exact median at sf0.01") {
    val li = graft.sources.Tables.lineitem(spark, Sf001)
    val approx = li.agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .as[Double].head()
    val exact = li.agg(expr("percentile(l_extendedprice, 0.5)")).as[Double].head()
    val relErr = math.abs(approx - exact) / exact
    info(f"GK approx median $approx%.2f vs exact $exact%.2f (rel err $relErr%.5f)")
    assert(relErr < 0.01)
  }

  test("approx_count_distinct(rsd=0.02) lands within 5% of the exact count at sf0.01") {
    val orders = graft.sources.Tables.orders(spark, Sf001)
    val approx = orders.agg(approx_count_distinct(col("o_custkey"), rsd = 0.02))
      .as[Long].head()
    val exact = orders.select(col("o_custkey")).distinct().count()
    val relErr = math.abs(approx - exact).toDouble / exact
    info(f"HLL++ approx $approx vs exact $exact (rel err $relErr%.4f)")
    assert(relErr < 0.05)
  }
}
