package graft.tools

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/** Shared-JVM cpu-inflation hunt (r13 verdict item 3): after the
  * corpus-fraction ANN shortlist queries run at 2M vectors, later
  * identical work in the same JVM was measured at 1.6–2× cpu_s with
  * zero spill (boxed-heap and JIT-code-cache causes already tested and
  * excluded in r13). This probe reproduces the shape in ONE JVM —
  * target query × reps ("before"), the ANN trigger set, target × reps
  * ("after") — and attributes each rep: wall, process-CPU delta, GC
  * time/count delta, heap committed, old-gen occupancy after the rep.
  * If after/before CPU inflates and the GC-time delta explains the
  * difference, the cause is collector pressure (old-gen occupancy from
  * the ANN phase's surviving allocations); if GC time is flat, the
  * mutator itself slowed (allocator, page faults, THP) — the A/B flags
  * (`GRAFT_JVM_EXTRA="-XX:+AlwaysPreTouch"`, `-XX:+UseParallelGC`,
  * MALLOC_ARENA_MAX) then split that space.
  *
  * `runMain graft.tools.InflationProbe <sfDir> <target> <reps>
  *   <annCsv|none> <outJson>`
  */
object InflationProbe {
  private val os = ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  private def gcStats(): (Long, Long) = {
    var t = 0L; var c = 0L
    ManagementFactory.getGarbageCollectorMXBeans.forEach { b =>
      t += math.max(0L, b.getCollectionTime)
      c += math.max(0L, b.getCollectionCount)
    }
    (t, c)
  }

  private def oldGenUsedMb(): Long =
    ManagementFactory.getMemoryPoolMXBeans.stream()
      .filter(p => p.getName.toLowerCase.contains("old") ||
        p.getName.toLowerCase.contains("tenured"))
      .mapToLong(p => p.getUsage.getUsed / (1024 * 1024)).sum()

  // hypervisor steal (r14): co-tenant bursts inflate guest task-CPU
  // accounting while invisible to load average — the per-rep steal
  // column is what separates "the JVM degraded" from "the host was
  // being robbed during this rep"
  private def stealJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().next().trim.split("\\s+")(8).toLong
      finally src.close()
    } catch { case _: Throwable => 0L }

  // host-speed calibration (r14): a fixed single-thread integer loop
  // timed immediately before each rep. The r14 adjudication measured
  // the host's per-core speed flipping ~2.2-3.6x between runs with ~0
  // steal (hypervisor frequency/turbo sharing — /sys cpufreq is not
  // exposed in this VM). cpu_s divided by the rep's calibration factor
  // is comparable across reps; raw cpu_s is not.
  private def calibrateMs(): Double = {
    var x = 0L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < 400000000L) { x += i * i; i += 1 }
    if (x == 42L) println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("sfgen/sf100docs")
    val target = args.lift(1).getOrElse("q_token_budget")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val annCsv = args.lift(3).getOrElse("q_ann_lsh,q_ann_ivf,q_ann_ivfpq")
    val outJson = args.lift(4).getOrElse("/tmp/inflation_probe.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val recs = new scala.collection.mutable.ArrayBuffer[String]()
    def run(phase: String, q: String): Unit = {
      val calib = calibrateMs()
      val (gt0, gc0) = gcStats()
      val cpu0 = os.getProcessCpuTime
      val st0 = stealJiffies()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (os.getProcessCpuTime - cpu0) / 1e9
      val steal = (stealJiffies() - st0) / 100.0
      val (gt1, gc1) = gcStats()
      val heapMb = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
        .getCommitted / (1024 * 1024)
      val rec = f"""{"phase":"$phase","query":"$q","wall_s":$wall%.2f,""" +
        f""""cpu_s":$cpu%.2f,"gc_s":${(gt1 - gt0) / 1e3}%.2f,""" +
        f""""gc_count":${gc1 - gc0},"heap_committed_mb":$heapMb,""" +
        f""""oldgen_used_mb":${oldGenUsedMb()},"steal_s":$steal%.2f,""" +
        f""""calib_ms":$calib%.1f}"""
      recs += rec
      println(s"REC $rec")
      // per-rep cache hygiene, the Bench discipline
      spark.catalog.clearCache()
    }

    // warmup: JIT + codegen for the scan path
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()

    (1 to reps).foreach(_ => run("before", target))
    if (annCsv != "none") annCsv.split(",").foreach(q => run("trigger", q))
    (1 to reps).foreach(_ => run("after", target))

    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments
    val argsJson = new java.util.ArrayList[String]()
    jvmArgs.forEach(a => if (a.startsWith("-X") || a.startsWith("-XX")) argsJson.add("\"" + a + "\""))
    val out = s"""{"sf_dir":"$sfDir","target":"$target","ann":"$annCsv",
      |"jvm_flags":[${String.join(",", argsJson)}],
      |"malloc_arena_max":"${sys.env.getOrElse("MALLOC_ARENA_MAX", "")}",
      |"reps":[${recs.mkString(",\n")}]}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      out.getBytes("UTF-8"))
    println(s"WROTE $outJson")
    spark.stop()
  }
}
