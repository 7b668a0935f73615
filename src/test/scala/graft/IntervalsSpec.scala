package graft

import org.apache.spark.sql.functions._
import graft.ops.Intervals

/** Gaps-and-islands interval merge: the cases that separate the
  * running-max-of-end formulation from the (wrong) lag-based one, plus
  * partition-order invariance.
  */
class IntervalsSpec extends SparkSpecBase {
  import spark.implicits._

  private def merge(rows: Seq[(String, Long, Long, Long)]) =
    Intervals.mergeIntervals(
      rows.toDF("k", "s", "e", "tb"), "k", "s", "e", col("tb"))
      .orderBy("k", "island")
      .select("k", "island", "island_start", "island_end", "n_intervals")
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("nested interval bridges a gap lag-based logic would split") {
    // [0,100) engulfs [10,20) and [30,40); [90,110) overlaps the tail.
    // lag(end) at the [30,40) row sees 20 (< 30) and would wrongly open
    // a new island; the running max of ends (100) keeps it merged.
    val out = merge(Seq(
      ("a", 0L, 100L, 1L), ("a", 10L, 20L, 2L), ("a", 30L, 40L, 3L),
      ("a", 90L, 110L, 4L), ("a", 200L, 210L, 5L)))
    assert(out === Seq(
      ("a", 1L, 0L, 110L, 4L),
      ("a", 2L, 200L, 210L, 1L)))
  }

  test("touching endpoints merge, strict gaps split, keys are independent") {
    // [0,10) and [10,20): start == prev end -> NOT strictly greater ->
    // same island (half-open adjacency merges). [21,30) opens a new one.
    val out = merge(Seq(
      ("a", 0L, 10L, 1L), ("a", 10L, 20L, 2L), ("a", 21L, 30L, 3L),
      ("b", 5L, 6L, 4L)))
    assert(out === Seq(
      ("a", 1L, 0L, 20L, 2L),
      ("a", 2L, 21L, 30L, 1L),
      ("b", 1L, 5L, 6L, 1L)))
  }

  test("result is invariant to input row order and partitioning") {
    val rows = Seq(
      ("a", 0L, 100L, 1L), ("a", 10L, 20L, 2L), ("a", 30L, 40L, 3L),
      ("a", 90L, 110L, 4L), ("a", 200L, 210L, 5L), ("b", 5L, 6L, 6L))
    val base = merge(rows)
    val shuffled = Intervals.mergeIntervals(
      rows.reverse.toDF("k", "s", "e", "tb").repartition(7), "k", "s", "e", col("tb"))
      .orderBy("k", "island")
      .select("k", "island", "island_start", "island_end", "n_intervals")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(shuffled === base)
  }
}
