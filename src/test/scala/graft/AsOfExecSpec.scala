package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinPhysical}

/** The physical as-of operator must be a drop-in for the compositional
  * union+window form: identical rows on real data, deterministic ties,
  * and the plan a merge join should have (two Exchanges, two Sorts, no
  * Window, the custom exec node present).
  */
class AsOfExecSpec extends SparkSpecBase {
  import spark.implicits._

  private def sides = {
    val ev = graft.sources.Tables.events(spark, Sf001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_event_id"), col("value").as("view_value"))
    (clicks, views)
  }

  test("physical as-of equals the union+window composition on sf0.01 events") {
    val (clicks, views) = sides
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t"),
        col("asof_view_event_id"), col("asof_view_value"))
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect().toSet
    val window = rows(AsOfJoin.leftAsOf(
      clicks, views, "user_id", "ts", Seq("view_event_id", "view_value")))
    val merged = rows(AsOfJoinPhysical.leftAsOf(
      clicks, views, "user_id", "ts", Seq("view_event_id", "view_value")))
    assert(window.nonEmpty)
    assert(window.exists(_._4.isEmpty), "some click must precede every view")
    assert(merged === window)
  }

  test("tie semantics: equal (key, time) right rows resolve to the greatest struct") {
    val left = Seq((1L, 100L, "L")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 5.0), (1L, 100L, 9.0), (1L, 100L, 7.0), // exact tie at t=100
      (1L, 50L, 1.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoinPhysical.leftAsOf(left, right, "k", "t", Seq("v"))
      .select(col("asof_v")).as[Double].collect().toSeq
    assert(out === Seq(9.0), "inclusive tie must carry the greatest value struct")
  }

  test("left outer: a left row before any right row gets nulls, not dropped") {
    val left = Seq((1L, 10L), (1L, 60L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 50L, 42.0)).toDF("k", "t", "v")
    val out = AsOfJoinPhysical.leftAsOf(left, right, "k", "t", Seq("v"))
      .select(col("k"), col("t"), col("asof_v"))
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(out === Set((1L, 10L, None), (1L, 60L, Some(42.0)), (2L, 10L, None)))
  }

  test("plan: AsOfJoinExec with per-side Exchange+Sort, no Window, no extra shuffle") {
    val (clicks, views) = sides
    val df = AsOfJoinPhysical.leftAsOf(
      clicks, views, "user_id", "ts", Seq("view_event_id", "view_value"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert(!p.contains("Window"), s"merge form must not fall back to a window:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 2, s"expected exactly one Exchange per side, got $exchanges:\n$p")
    val sorts = "Sort ".r.findAllIn(p).length
    assert(sorts == 2, s"expected exactly one Sort per side, got $sorts:\n$p")
  }
}
