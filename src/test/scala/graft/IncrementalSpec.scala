package graft

import org.apache.spark.sql.functions._
import graft.ops.Incremental
import graft.sources.Tables

class IncrementalSpec extends SparkSpecBase {
  import spark.implicits._

  test("state ⊕ delta == full recompute, exactly, across three refresh cycles") {
    val orders = Tables.orders(spark, Sf001)
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    val keys = Seq("o_custkey"); val sums = Seq("price_cents")

    // split the table into base + 3 date-ordered delta batches
    val Array(q1, q2, q3) =
      orders.stat.approxQuantile("o_custkey", Array(0.25, 0.5, 0.75), 0.0)
    val parts = Seq(
      orders.filter(col("o_custkey") <= q1),
      orders.filter(col("o_custkey") > q1 && col("o_custkey") <= q2),
      orders.filter(col("o_custkey") > q2 && col("o_custkey") <= q3),
      orders.filter(col("o_custkey") > q3))

    var state = Incremental.aggState(parts.head, keys, sums)
    parts.tail.foreach { delta =>
      state = Incremental.refresh(state, delta, keys, sums)
    }
    val got = state.as[(Long, Long, Long)].collect()
    val full = Incremental.aggState(orders, keys, sums)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet === full.toSet,
      "incrementally maintained aggregate must equal the recompute")
    assert(got.map(_._2).sum === orders.count())
  }
}
