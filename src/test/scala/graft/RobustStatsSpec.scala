package graft

import org.apache.spark.sql.functions._
import graft.ops.RobustStats

/** Sort-window selection percentiles must be EXACTLY the built-in
  * `percentile` aggregate (same interpolation), on adversarial shapes:
  * duplicates, skewed groups, single-element groups, even/odd counts.
  */
class RobustStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("percentilesByGroup == built-in percentile on 20 random datasets") {
    val rnd = new scala.util.Random(17)
    (0 until 20).foreach { trial =>
      val rows = (0 until 50 + rnd.nextInt(200)).map { _ =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(30).toLong)
      } :+ (("lonely", 7L)) // single-element group: p·(n−1) = 0 for all p
      val df = rows.toDF("g", "v").repartition(5)
      val got = RobustStats.percentilesByGroup(df, "g", "v",
          Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)))
        .select("g", "p25", "p50", "p75").as[(String, Double, Double, Double)]
        .collect().sortBy(_._1)
      val want = df.groupBy(col("g"))
        .agg(percentile(col("v"), lit(0.25)).as("p25"),
          percentile(col("v"), lit(0.5)).as("p50"),
          percentile(col("v"), lit(0.75)).as("p75"))
        .select("g", "p25", "p50", "p75").as[(String, Double, Double, Double)]
        .collect().sortBy(_._1)
      assert(got === want, s"trial $trial diverged from built-in percentile")
    }
  }

  test("spillable percentile: the DISK-SPILL path equals the built-in") {
    // spillThreshold=64 forces every partial and final buffer through
    // many sorted-run spills and the k-way merge (10k rows across 3
    // groups and 7 partitions ≈ 50+ runs) — the path a 100 TB group
    // lives on, which the built-in `percentile` cannot take at all
    val rnd = new scala.util.Random(11)
    val rows = (0 until 10000).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toDouble)
    }
    val df = rows.toDF("g", "v").repartition(7)
    val got = df.groupBy(col("g"))
      .agg(graft.functions.SpillablePercentile
        .agg(col("v"), Seq(0.1, 0.5, 0.9), spillThreshold = 64).as("ps"))
      .select(col("g"), element_at(col("ps"), 1), element_at(col("ps"), 2),
        element_at(col("ps"), 3))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.1)).as("a"),
        percentile(col("v"), lit(0.5)).as("b"),
        percentile(col("v"), lit(0.9)).as("c"))
      .select("g", "a", "b", "c")
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(got === want)
    // nulls are ignored, all-null groups disappear (built-in parity)
    val withNulls = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)).toDF("g", "v")
    val g2 = RobustStats.percentilesByGroup(withNulls, "g", "v", Seq(("p50", 0.5)))
      .select("g", "n", "p50").as[(String, Long, Double)].collect().toSet
    assert(g2 === Set(("a", 2L, 2.0)))
  }

  test("spillable percentile: sort-based aggregation fallback (>128 groups) equals the built-in") {
    // ObjectHashAggregateExec abandons its hash map after
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold (128)
    // distinct groups and switches to sort-based aggregation — a
    // different serialize/merge choreography for the buffer. 1000
    // groups forces that path end to end.
    val rnd = new scala.util.Random(29)
    val rows = (0 until 20000).map { _ =>
      (s"g${rnd.nextInt(1000)}", rnd.nextInt(500).toDouble)
    }
    val df = rows.toDF("g", "v").repartition(6)
    val got = df.groupBy(col("g"))
      .agg(graft.functions.SpillablePercentile
        .agg(col("v"), Seq(0.5), spillThreshold = 16).as("ps"))
      .select(col("g"), element_at(col("ps"), 1))
      .as[(String, Double)].collect().toMap
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.5)).as("m"))
      .select("g", "m").as[(String, Double)].collect().toMap
    assert(got === want)
  }

  test("madOutliersByGroup == the collect-based three-pass reference") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 500).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("g", "v").repartition(7)
    val got = RobustStats.madOutliersByGroup(df, "g", "v")
      .select("g", "n", "n_outliers", "med", "mad")
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    val want = rows.groupBy(_._1).toSeq.map { case (g, vs) =>
      def pct(xs: Seq[Double], p: Double): Double = {
        val s = xs.sorted; val idx = p * (s.length - 1)
        val lo = s(idx.toInt); val hi = s(math.ceil(idx).toInt)
        lo * (1 - (idx - math.floor(idx))) + hi * (idx - math.floor(idx))
      }
      val xs = vs.map(_._2.toDouble)
      val med = pct(xs, 0.5)
      val devs = xs.map(x => math.abs(x - med))
      val mad = pct(devs, 0.5)
      (g, xs.length.toLong, devs.count(_ > 3.0 * mad).toLong, med, mad)
    }.sortBy(_._1)
    assert(got === want)
  }
}
