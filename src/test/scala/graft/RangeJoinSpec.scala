package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def points = Seq(
    (1L, 10L, 100L), (1L, 11L, 250L), (1L, 12L, 999L),
    (2L, 20L, 100L), (3L, 30L, 5L)
  ).toDF("k", "pid", "t")

  // intervals: [50,300] and [240,260] for k=1 (overlapping!), [0,99] for
  // k=2 (excludes t=100), [5,5] degenerate for k=3
  private def intervals = Seq(
    (1L, 50L, 300L), (1L, 240L, 260L), (2L, 0L, 99L), (3L, 5L, 5L)
  ).toDF("k", "lo", "hi")

  test("binned range join == naive inequality join, including overlaps and bounds") {
    for (w <- Seq(1L, 7L, 100L, 1000L)) {
      val binned = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi",
          Seq("k"), binWidth = w)
        .select("k", "pid", "lo", "hi").as[(Long, Long, Long, Long)].collect().toSet
      val naive = points.join(intervals, Seq("k"))
        .filter(col("t") >= col("lo") && col("t") <= col("hi"))
        .select("k", "pid", "lo", "hi").as[(Long, Long, Long, Long)].collect().toSet
      assert(binned === naive, s"binWidth=$w")
      // point 11 (t=250) matches BOTH k=1 intervals; inclusive bounds
      // keep the degenerate [5,5] match
      assert(binned.contains((1L, 11L, 50L, 300L)) && binned.contains((1L, 11L, 240L, 260L)))
      assert(binned.contains((3L, 30L, 5L, 5L)))
      assert(!binned.exists(r => r._1 == 2L), s"binWidth=$w: t=100 > hi=99 must not match")
    }
  }

  test("negative axis values bin correctly (floor, not truncate-toward-zero)") {
    val p = Seq((1L, 1L, -150L), (1L, 2L, -50L)).toDF("k", "pid", "t")
    val iv = Seq((1L, -200L, -100L)).toDF("k", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "t", iv, "lo", "hi", Seq("k"), 100L)
      .select("pid").as[Long].collect().toSet
    assert(got === Set(1L))
  }
}
