package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("leftAsOf picks the latest right row at or before each left time, per key") {
    val left = Seq(
      (1L, 5L, "l5"), (1L, 10L, "l10"), (1L, 15L, "l15"), (1L, 25L, "l25"),
      (2L, 12L, "l12")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, "a", 1.0), (1L, 20L, "b", 2.0),
      (2L, 99L, "z", 9.0) // after key 2's only left row
    ).toDF("k", "t", "name", "v")

    val got = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("name", "v"))
      .select("tag", "asof_name", "asof_v").as[(String, Option[String], Option[Double])]
      .collect().map(r => r._1 -> ((r._2.orNull, r._3))).toMap

    assert(got("l5") === ((null, None)), "no right row before t=5")
    assert(got("l10") === (("a", Some(1.0))), "equal timestamps count as at-or-before")
    assert(got("l15") === (("a", Some(1.0))))
    assert(got("l25") === (("b", Some(2.0))), "latest wins, not first")
    assert(got("l12") === ((null, None)), "keys must not leak across groups")
  }

  test("right-row columns travel atomically (no cross-row mixing)") {
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, "first", 1.0), (1L, 20L, "second", 2.0))
      .toDF("k", "t", "name", "v")
    val row = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("name", "v"))
      .select("asof_name", "asof_v").as[(String, Double)].head()
    assert(row === (("second", 2.0)))
  }
}
