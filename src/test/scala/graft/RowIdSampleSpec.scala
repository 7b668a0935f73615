package graft

import org.apache.spark.sql.functions._

/** R14 (`monotonically_increasing_id`, project-co2.py:102) and R16
  * (seeded Bernoulli sample, project-co2.py:48) — semantics the SURVEY
  * claims, proven here since neither is cross-engine oracle-checkable
  * (mono-ids depend on partition layout; sampling on Spark's RNG).
  */
class RowIdSampleSpec extends SparkSpecBase {
  import spark.implicits._

  test("monotonically_increasing_id: unique, non-negative, increasing within a partition") {
    val df = spark.range(10000).toDF("n").repartition(8)
      .withColumn("mid", monotonically_increasing_id())
    val rows = df.select(col("mid"), spark_partition_id().as("p"))
      .as[(Long, Int)].collect()
    assert(rows.map(_._1).distinct.length === rows.length, "ids must be globally unique")
    assert(rows.forall(_._1 >= 0L))
    rows.groupBy(_._2).values.foreach { part =>
      val ids = part.map(_._1)
      assert(ids.sorted === ids.sorted.distinct.sorted)
      // within one partition ids are a contiguous increasing run
      assert(ids.max - ids.min === ids.length - 1)
    }
  }

  test("seeded sample: deterministic, fraction-bounded, seed-sensitive") {
    val base = spark.range(20000).toDF("n")
    val s1 = base.sample(withReplacement = false, 0.3, seed = 42L)
      .as[Long].collect().toSet
    val s2 = base.sample(withReplacement = false, 0.3, seed = 42L)
      .as[Long].collect().toSet
    val s3 = base.sample(withReplacement = false, 0.3, seed = 7L)
      .as[Long].collect().toSet
    assert(s1 === s2, "same seed must select the same rows")
    assert(s1 !== s3, "different seeds must select different rows")
    // Bernoulli(0.3) over 20000 rows: ±6 sigma bound
    assert(s1.size > 5600 && s1.size < 6400, s"sample size ${s1.size} outside bounds")
  }

  test("stratified sampleBy: per-stratum fractions honored, deterministic under seed") {
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf001).select(col("event_id"), col("event_type"))
    val fractions = Map("view" -> 0.5, "click" -> 0.1, "purchase" -> 1.0)
    def draw(seed: Long) =
      ev.stat.sampleBy("event_type", fractions, seed)
        .as[(Long, String)].collect()

    val a = draw(42L); val b = draw(42L); val c = draw(7L)
    assert(a.toSet === b.toSet, "same seed, same stratified sample")
    assert(a.toSet !== c.toSet, "seed must matter")

    val strata = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    val got = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(!got.contains("signup") && !got.contains("error"),
      "unlisted strata must be excluded entirely")
    assert(got("purchase") === strata("purchase"), "fraction 1.0 keeps every row")
    // Bernoulli per stratum, ±6 sigma
    for ((t, f) <- Seq("view" -> 0.5, "click" -> 0.1)) {
      val n = strata(t); val mean = f * n
      val dev = 6 * math.sqrt(n * f * (1 - f))
      assert(math.abs(got(t) - mean) < dev,
        s"$t: ${got(t)} outside $mean ± $dev")
    }
  }
}
