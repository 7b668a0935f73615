package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew handling — the planner-side complement to
  * `SkewJoin.saltedEquiJoin` (the explicit technique q_salted_join
  * oracle-checks). At 100 TB a hot key lands one reducer with most of
  * the shuffle; AQE's OptimizeSkewedJoin splits that partition at
  * runtime into advisory-sized slices. This spec PROVES the runtime
  * path actually engages on this build (config drift — aqe off, skew
  * join off, thresholds raised — would silently fall back to the
  * one-hot-reducer plan) and that the split join is row-identical to
  * the unsplit one.
  */
class AqeSkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition and preserves results") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      // coalescing would merge the tiny partitions and shift the median;
      // keep the skew signal clean
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k fact rows, 95% on key 0 → one shuffle partition holds ~3 MB
      // while the median is tiny; dim side too big to broadcast (forced
      // off anyway) so the join is a shuffle join AQE can re-plan.
      // the payload is incompressible (md5 hex) and survives column
      // pruning (it feeds the agg) — without it the hot partition's
      // constant-key rows lz4-compress below any skew threshold
      val fact = spark.range(100000L).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(pmod(col("id"), lit(101L))).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(101L).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("tag"))

      // min(payload) keeps the payload column alive through pruning
      // (count(payload) alone gets rewritten to count(1) and pruned)
      val agg = fact.join(dim, "k").groupBy(col("tag"))
        .agg(count(lit(1)).as("n"), min(col("payload")).as("p"))
        .as[(String, Long, String)]
      val got = agg.collect().map(r => r._1 -> r._2).toMap

      // AQE finalizes the plan only on execution — read it back AFTER
      // the collect, from the exact Dataset instance that ran (.as/
      // .select would wrap a fresh, unexecuted QueryExecution)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"expected an executed adaptive plan:\n$plan")
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE must mark the hot partition as skewed in the final plan:\n$plan")

      // exact expected counts by construction: key 0 gets the 95% plus
      // its own residue class hits (id % 20 == 0 && id % 101 == 0)
      val expected = (0L until 100000L).toSeq
        .map(id => if (id % 20 != 0) 0L else id % 101L)
        .groupBy(identity).map { case (k, v) => (s"dim_$k", v.size.toLong) }
      assert(got === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
