package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  *
  * Sink is the `noop` datasource — it fully evaluates every row of every
  * projected column (unlike `count()`, which lets Catalyst prune all
  * columns and measures only scan+filter). Failures are NOT swallowed:
  * a failed query records `"err"` and the process exits nonzero, so a
  * broken query can never read as fast-and-green.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events parquet carries TIMESTAMP(NANOS); read as long + convert
      // (see Tables.events) instead of failing the scan.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb codegen/classloading so the first timed query is honest
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    final case class R(name: String, sec: Double, err: Option[String])
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // several queries persist() intermediates; clearing between
      // queries (outside the timed region) keeps timings isolated
      spark.catalog.clearCache()
      R(name, sec, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { r =>
      val v = r.err match {
        case None    => r.sec.toString
        case Some(m) => s"""{"sec":${r.sec},"err":${jstr(m)}}"""
      }
      jstr(r.name) + ":" + v
    }.mkString("{", ",", "}")
    val total = results.map(_.sec).sum
    val nErr = results.count(_.err.isDefined)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_err":$nErr,"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
