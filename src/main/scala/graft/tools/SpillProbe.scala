package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Constrained-memory A/B probe for the exact-percentile path (r12
  * verdict item 7): run ONE variant per JVM — the wrapper script sets
  * the heap and records the exit — so the built-in's OOM is an observed
  * process death, not a caught-and-hoped-for exception.
  *
  *   mode "spill"   — RobustStats.percentilesByGroup (the
  *                    percentile_spill aggregate): per-group memory is
  *                    capped at the spill threshold; sorted runs go to
  *                    disk and are k-way merged at eval. Prints the run
  *                    bytes actually spilled (PercentileBuf telemetry —
  *                    these files are invisible to Spark's
  *                    diskBytesSpilled, which covers shuffle/agg spill
  *                    only).
  *   mode "builtin" — Spark's exact `percentile` aggregate, whose
  *                    per-group distinct-value counts map cannot spill.
  *
  * Value column: the replicated scale corpus duplicates every measure
  * column k-fold, so natural columns keep sf0.1 cardinality and the
  * built-in's counts map stays artificially small — unlike a real
  * corpus, where a continuous measure is effectively all-distinct. The
  * probe restores that shape with a deterministic sub-cent perturbation
  * of l_extendedprice by the (unique, shifted) l_orderkey:
  * extendedprice + orderkey/1e12 — ~60M distinct doubles at sf10, the
  * exact shape the spillable aggregate exists for. Both variants see
  * the same column, so the A/B isolates the buffer strategy.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("spill")
    val dir = args.lift(1).getOrElse("/root/repo/sfgen/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (col("l_extendedprice") + col("l_orderkey") / 1e12).as("v"))
    val t0 = System.nanoTime()
    val rows = mode match {
      case "builtin" =>
        li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(v, array(0.25, 0.5, 0.75))").as("ps"),
            count(col("v")).as("n"))
          .orderBy(col("l_returnflag")).collect()
      case _ =>
        graft.ops.RobustStats.percentilesByGroup(
            li, "l_returnflag", "v",
            Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)))
          .orderBy(col("l_returnflag")).collect()
    }
    val wallS = (System.nanoTime() - t0) / 1e9
    val spilledMb =
      graft.functions.PercentileBuf.spilledBytes.sum() / 1048576.0
    val vals = rows.map(_.toSeq.mkString("[", ",", "]")).mkString(";")
    println(s"""{"mode":"$mode","wall_s":${"%.1f".format(wallS)},""" +
      s""""groups":${rows.length},""" +
      s""""pctl_run_spill_mb":${"%.1f".format(spilledMb)},""" +
      s""""rows":"$vals","ok":true}""")
    spark.stop()
  }
}
