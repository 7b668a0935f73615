package graft

import graft.ops.Preprocess

class PreprocessSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    (Some(1), Some(1.0), Some("a")),
    (None, None, None),
    (Some(2), None, Some("b")),
    (Some(3), Some(Double.NaN), Some("c")),
    (Some(4), Some(4.0), Some("a"))
  ).toDF("id", "v", "s")

  test("dropAllNull removes only all-null rows (project-co2.py:25)") {
    assert(Preprocess.dropAllNull(df).count() === 4)
  }

  test("dropAnyNull removes rows with any null (project-co2.py:29)") {
    // Spark's na.drop also treats NaN as missing
    assert(Preprocess.dropAnyNull(df).count() === 2)
  }

  test("dropAllNull with subset (project-co2.py:26)") {
    assert(Preprocess.dropAllNull(df, Seq("id", "v")).count() === 4)
  }

  test("dropNullOrNan matches na.drop('any') semantics explicitly") {
    val got = Preprocess.dropNullOrNan(df, Seq("id", "v", "s"))
    assert(got.count() === 2)
    assert(got.select("id").as[Int].collect().sorted === Array(1, 4))
  }

  test("dropDuplicatesKeepFirst is deterministic by tiebreak") {
    val dup = Seq((1, "x"), (2, "x"), (3, "y")).toDF("id", "k")
    val got = Preprocess.dropDuplicatesKeepFirst(dup, Seq("k"), "id")
    assert(got.select("id").as[Int].collect().sorted === Array(1, 3))
  }
}
