package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway stage-level profiler for one query: prints per-stage
  * wall-clock, summed executor run time, shuffle bytes, and spill, so
  * under-load inflation can be attributed (CPU vs shuffle I/O vs spill)
  * without the UI. `runMain graft.tools.StageProfile <query> [sfDir]`.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q_simjoin_prefix")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        // run = summed task wall (includes cache-lock / IO waits);
        // cpu = summed ON-CPU nanos — the contention-relevant number
        rows.add(f"stage=${si.stageId}%4d wall=${wall}%6dms run=${m.executorRunTime}%7dms " +
          f"cpu=${m.executorCpuTime / 1000000}%7dms " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
          f"spill=${m.diskBytesSpilled / 1024}%6dKB tasks=${si.numTasks}%3d  ${si.name.take(60)}")
      }
    })
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    // optional repeat count (arg 3): run N times, print stages for the
    // LAST run — later runs are JIT-warm, matching the bench process
    // where the query runs after ~170 others
    val reps = if (args.length > 2) args(2).toInt else 1
    var sec = 0.0
    (1 to reps).foreach { rep =>
      rows.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      sec = (System.nanoTime() - t0) / 1e9
      println(f"RUN $rep $query: $sec%.2f s")
    }
    Thread.sleep(500) // let listener drain
    rows.forEach(println)
    println(f"TOTAL $query: $sec%.2f s")
    spark.stop()
  }
}
