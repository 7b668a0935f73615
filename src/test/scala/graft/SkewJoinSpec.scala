package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted equi-join is row-identical to the plain join, including a hot key") {
    // 90% of fact rows share key 1 — the skew case salting exists for
    val fact = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (1L + i % 7, 1000L + i)))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f")).toDF("k", "name")

    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k",
        numSalts = 8, saltSource = Seq("payload"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
    assert(salted.length === 1000)
  }

  test("salt actually spreads the hot key across distinct salt values") {
    val fact = (1 to 500).map(i => (1L, i.toLong)).toDF("k", "payload")
    val nSalts = fact.withColumn("s",
        pmod(xxhash64(col("payload")), lit(8L)).cast("int"))
      .select("s").distinct().count()
    assert(nSalts === 8, "hash salt over a varying column must hit all buckets")
  }
}
