package graft

import graft.ops.Merge

class MergeSpec extends SparkSpecBase {
  import spark.implicits._

  test("upsert: update wins on match, base survives, inserts appear — and a null update wins") {
    val base = Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L), (3L, Option("c"), 30L))
      .toDF("k", "s", "v")
    val updates = Seq((2L, Option.empty[String], 99L), (4L, Option("d"), 40L))
      .toDF("k", "s", "v")
    val got = Merge.upsert(base, updates, Seq("k"))
      .as[(Long, Option[String], Long)].collect().toSet
    assert(got === Set(
      (1L, Some("a"), 10L),      // untouched base
      (2L, None, 99L),           // matched: update wins INCLUDING its null
      (3L, Some("c"), 30L),      // untouched base
      (4L, Some("d"), 40L)))     // insert
  }

  test("upsert rejects schema drift") {
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(Seq((1L, 1L)).toDF("k", "v"), Seq((1L, 1L)).toDF("k", "w"), Seq("k"))
    }
    assert(e.getMessage.contains("schemas must match"))
  }
}
