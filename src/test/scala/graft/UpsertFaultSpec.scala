package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.streaming.EventStream

/** Write-path fault injection (r10 verdict item 6): kill a REAL JVM
  * mid-commit of the manifest-promote upsert sink and prove no torn
  * state. RetrySpec covers compute retries and StreamingSpec covers
  * clean restarts; this is the missing case — process death BETWEEN
  * stage and promote.
  *
  * For each kill point (mid_stage = after the first gen-dir move;
  * post_stage = all gens staged, manifest old; post_promote = manifest
  * new, superseded gens not yet GC'd) a child JVM applies batch 1 and
  * `halt()`s at that point. The invariants:
  *  - the reader ([[EventStream.readUpsertState]]) sees EXACTLY the
  *    pre-batch state for pre-promote kills and EXACTLY the post-batch
  *    state for the post-promote kill — never a mix;
  *  - every generation the manifest names exists on disk at all times;
  *  - redelivering the killed batch (foreachBatch's replay contract)
  *    converges to the all-clean run bit-for-bit, and sweeps the
  *    crashed attempt's leftovers.
  */
class UpsertFaultSpec extends SparkSpecBase {

  private def applyBatch(state: String, batchId: Long): Unit = {
    import spark.implicits._
    EventStream.upsertBatch(state, "k", "ts")(
      graft.tools.UpsertKillRunner.batchRows(batchId).toDF("k", "ts", "v"),
      batchId)
  }

  /** Child JVM running UpsertKillRunner, optionally with a kill point
    * in its environment. Opens flags are copied from THIS JVM's args
    * (build.sbt's jdk17AddOpens) so the child can start a SparkSession.
    */
  private def runChild(state: String, batchId: Long, kill: Option[String]): Int = {
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++
      jvmArgs ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.UpsertKillRunner", state, batchId.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File("/dev/null"))
    kill.foreach(k => pb.environment().put("GRAFT_UPSERT_KILL_POINT", k))
    val p = pb.start()
    p.waitFor()
  }

  private def snapshot(state: String): Seq[(String, Long, String)] =
    EventStream.readUpsertState(spark, state)
      .select("k", "ts", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def manifestGensExist(state: String): Boolean = {
    val m = Paths.get(state, "MANIFEST")
    !Files.exists(m) || Files.readAllLines(m).asScala.filter(_.nonEmpty)
      .forall { line =>
        val Array(b, g) = line.split(",")
        Files.isDirectory(Paths.get(s"$state/b$b/g$g"))
      }
  }

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"upsertfault-$tag-")
    d.toString
  }

  // the all-clean reference run, entirely in-process
  private lazy val cleanRuns: (Seq[(String, Long, String)], Seq[(String, Long, String)]) = {
    val d = freshDir("clean")
    applyBatch(d, 0)
    val afterB0 = snapshot(d)
    applyBatch(d, 1)
    (afterB0, snapshot(d))
  }

  test("clean two-batch run has latest-per-key semantics") {
    val (afterB0, afterB1) = cleanRuns
    assert(afterB0.size == 150 && afterB0.forall(_._2 == 0L))
    assert(afterB1.size == 200) // keys k0..k199
    // overlap keys k50..k149 must be batch 1's rows
    assert(afterB1.count(_._2 == 1L) == 150)
    assert(afterB1.count(_._2 == 0L) == 50)
  }

  for (kp <- Seq("mid_stage", "post_stage", "post_promote")) {
    test(s"JVM halt at $kp leaves no torn state and recovers idempotently") {
      val (afterB0, afterB1) = cleanRuns
      val d = freshDir(kp)
      applyBatch(d, 0)
      assert(snapshot(d) == afterB0)

      val exit = runChild(d, 1, Some(kp))
      assert(exit == 137, s"child was expected to halt(137), exited $exit")

      // never a torn read: old state for pre-promote kills, new for post
      assert(manifestGensExist(d), "manifest names a missing generation")
      val seen = snapshot(d)
      if (kp == "post_promote") assert(seen == afterB1)
      else assert(seen == afterB0)

      // redelivery of the SAME batchId converges to the clean run
      applyBatch(d, 1)
      assert(manifestGensExist(d))
      assert(snapshot(d) == afterB1)
      // the crashed attempt's staging dir was swept
      assert(!Files.exists(Paths.get(s"$d/.tmp-1")))
    }
  }
}
