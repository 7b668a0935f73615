package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRule

/** The optimizer-rule route to [[graft.ops.RangeJoin]]: a user writing
  * the NAIVE inequality-join API gets the binned plan transparently.
  *
  * Two distinct wins, both covered here:
  *  - NO equi key (pure point-in-interval): Spark plans
  *    BroadcastNestedLoopJoin — O(|points|·|intervals|). The rule turns
  *    it into a hash join on the bin.
  *  - WITH an equi key: Spark hash-joins on the key alone and runs the
  *    range predicates as the join's residual condition — per-key
  *    quadratic when a key is hot. The rule adds the bin to the join
  *    key, so residual comparisons drop to same-bin pairs.
  *
  * Equivalence oracle: the same query with the rule absent.
  */
class RangeJoinRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private def points = Seq(
    (1L, 10L, 100L), (1L, 11L, 250L), (1L, 12L, 999L),
    (2L, 20L, 100L), (3L, 30L, 5L), (3L, 31L, -150L)
  ).toDF("k", "pid", "t")

  private def intervals = Seq(
    (1L, 50L, 300L), (1L, 240L, 260L), (2L, 0L, 99L),
    (3L, 5L, 5L), (3L, -200L, -100L)
  ).toDF("k", "lo", "hi")

  private def naivePure = {
    val p = points.select("pid", "t"); val iv = intervals.select("lo", "hi")
    p.join(iv, p("t") >= iv("lo") && p("t") <= iv("hi"))
      .select(col("pid"), col("lo"), col("hi"))
  }

  private def naiveKeyed = {
    val p = points; val iv = intervals
    p.join(iv, p("k") === iv("k") && p("t") >= iv("lo") && p("t") <= iv("hi"))
      .select(p("k"), col("pid"), col("lo"), col("hi"))
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule(spark)
    spark.conf.set("spark.graft.rangeJoin.binWidth", "100")
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRule])
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }

  test("pure range join: nested loop without the rule, hash join with it, same rows") {
    val expected = naivePure.as[(Long, Long, Long)].collect().toSet
    val basePlan = naivePure.queryExecution.executedPlan.toString
    assert(basePlan.contains("BroadcastNestedLoopJoin"),
      s"sanity: a keyless range join nested-loops without the rule:\n$basePlan")

    withRule {
      val df = naivePure
      assert(df.as[(Long, Long, Long)].collect().toSet === expected)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule must produce an equi join on the bin:\n$plan")
      assert(plan.contains("HashJoin") && plan.contains("__graft_bin"), plan)
    }
  }

  test("keyed range join: the bin joins alongside the key, same rows") {
    val expected = naiveKeyed.as[(Long, Long, Long, Long)].collect().toSet
    withRule {
      val df = naiveKeyed
      assert(df.as[(Long, Long, Long, Long)].collect().toSet === expected)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"),
        s"join keys must include the bin, not run ranges as a hot-key residual:\n$plan")
    }
  }

  test("join-then-filter spelling rewrites too (pushdown folds the filter into the join)") {
    withRule {
      val df = points.join(intervals, "k")
        .filter(col("t") >= col("lo") && col("t") <= col("hi"))
        .select(col("k"), col("pid"), col("lo"), col("hi"))
      assert(df.as[(Long, Long, Long, Long)].collect().toSet ===
        naiveKeyed.as[(Long, Long, Long, Long)].collect().toSet)
      assert(df.queryExecution.executedPlan.toString.contains("__graft_bin"))
    }
  }

  test("off-switch restores the naive plan") {
    withRule {
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      try {
        val plan = naivePure.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastNestedLoopJoin"), plan)
      } finally spark.conf.unset("spark.graft.rangeJoin.enabled")
    }
  }

  test("inverted intervals (hi < lo) match nothing instead of crashing the sequence") {
    withRule {
      val p = Seq((1L, 10L, 100L)).toDF("k", "pid", "t")
      val iv = Seq((1L, 300L, 50L), (1L, 50L, 300L)).toDF("k", "lo", "hi")
      val got = p.join(iv,
          p("k") === iv("k") && p("t") >= iv("lo") && p("t") <= iv("hi"))
        .select(col("pid"), col("lo")).as[(Long, Long)].collect().toSet
      assert(got === Set((10L, 50L)), "only the well-formed interval matches")
    }
  }

  test("fuzz: random points/intervals, every bin width, rule == no-rule") {
    val rnd = new scala.util.Random(20240812L)
    val pts = Seq.fill(300)((rnd.nextInt(4).toLong,
      rnd.nextLong() % 1000L)).zipWithIndex
      .map { case ((k, t), i) => (k, i.toLong, t) }
    val ivs = Seq.fill(60) {
      val a = rnd.nextLong() % 1000L
      val b = a + rnd.nextInt(300) - 40 // ~13% inverted on purpose
      (rnd.nextInt(4).toLong, a, b)
    }
    val p = pts.toDF("k", "pid", "t")
    val iv = ivs.toDF("k", "lo", "hi")
    def run() = {
      val q = p.join(iv, p("k") === iv("k") && p("t") >= iv("lo") && p("t") <= iv("hi"))
        .select(col("pid"), col("lo"), col("hi"))
      q.as[(Long, Long, Long)].collect().toSet
    }
    val expected = run() // no rule
    assert(expected.nonEmpty, "fuzz setup must produce matches")
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      withRule {
        spark.conf.set("spark.graft.rangeJoin.binWidth", w.toString)
        assert(run() === expected, s"binWidth=$w")
      }
    }
  }

  test("strict bounds and negative axis values stay exact") {
    withRule {
      val p = points; val iv = intervals
      val strict = p.join(iv,
          p("k") === iv("k") && p("t") > iv("lo") && p("t") < iv("hi"))
        .select(col("pid"), col("lo")).as[(Long, Long)].collect().toSet
      // inclusive-only matches ([5,5]) drop; interior matches stay,
      // including on the negative axis
      assert(strict === Set((10L, 50L), (11L, 50L), (11L, 240L), (31L, -200L)))
    }
  }
}
