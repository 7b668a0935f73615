package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** RocksDB large-state streaming soak (r9 verdict item 4) — the last
  * untested 100 TB posture: keyed state DELIBERATELY larger than the
  * JVM heap, plus a KILL-and-restart recovery from the checkpoint.
  *
  * [[StreamBench]] publishes the throughput/latency record for the
  * steady-CHURN shape (state ≈ rate × a few seconds — eviction keeps
  * state heap-sized no matter how long the run). Real pipelines also
  * carry the OTHER shape: state that ACCUMULATES with key cardinality
  * (dedup sets, per-user aggregates, feature counters). With the
  * default HDFS-backed provider every state row lives ON HEAP as
  * immutable Scala maps — tens of millions of keys on a small heap is
  * an OOM by construction. The RocksDB provider
  * (`spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider`,
  * in-box since Spark 3.2) keeps rows in native memtables + SST files
  * on local disk, so state scales with DISK, not heap — the posture a
  * 1000-executor cluster actually runs with.
  *
  * Workload: rate source at R rows/s where EVERY value is a distinct
  * key (`k = value`), `groupBy(k).count` in update mode → noop sink.
  * State rows grow linearly forever — R×T keys after T seconds — so a
  * run is sized to push state rows × bytes/row well past the heap:
  * e.g. 150k rows/s × 300 s = 45M keys on a 4 g heap.
  *
  * The kill is REAL: each phase is its own JVM (`phase1 | phase2`
  * argument), and phase 1 ends with `Runtime.halt()` mid-stream — no
  * stop(), no JVM shutdown hooks, native RocksDB instances shot dead
  * mid-write, exactly the executor-loss case. (An earlier same-JVM
  * variant stop()ed phase 1 and restarted in-process; rocksdbjni's
  * background compaction then SIGSEGV'd the JVM in its JNI log
  * callback during phase 2 — the process boundary is also what a real
  * cluster restart has.) Phase 2 starts from the SAME checkpoint; the
  * record asserts it resumes at a later batchId with phase 1's state
  * rows intact (the uncommitted tail batch replays idempotently —
  * distinct keys absorb it), keeps growing at the nominal rate, and
  * `tools/stream_soak.sh` merges the phase JSONs into
  * `bench_baselines/r10_streaming_rocksdb.json`.
  */
object StreamSoak {

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse("phase1")
    val stateDir = args.lift(1).getOrElse("/tmp/streamsoak")
    val out = args.lift(2).getOrElse(s"/tmp/streamsoak_$phase.json")
    val rate = sys.env.getOrElse("SPARK_GRAFT_SOAK_RATE", "150000").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_SOAK_SECS", "150").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 8 shuffle partitions = 8 RocksDB instances: state-store count
      // scales native memtable memory, and a soak's bottleneck is keyed
      // state, not compute — fewer, bigger stores is the right shape
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", 8)
      .load()
      .select(col("value").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("update")
      .format("noop")
      .option("checkpointLocation", s"$stateDir/ckpt")
      .trigger(Trigger.ProcessingTime("2 seconds"))
      .start()
    Thread.sleep(secs * 1000L)
    val progress = q.recentProgress.toSeq
    val meas = progress.filter(_.numInputRows > 0)
    require(meas.nonEmpty, s"no batches measured in $phase at rate=$rate")

    def instant(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    val spanMs = math.max(2000L,
      instant(meas.last.timestamp) - instant(meas.head.timestamp) + 2000L)
    val trig = meas.flatMap(p => Option(p.durationMs.get("triggerExecution"))
      .map(_.toLong)).sorted
    def pct(p: Double): Long =
      if (trig.isEmpty) 0L else trig(math.min(trig.size - 1, (p * trig.size).toInt))
    def stateRows(i: Int): Long = meas(i).stateOperators.toSeq.map(_.numRowsTotal).sum
    val heapMb = Runtime.getRuntime.maxMemory() / 1048576
    val doc =
      s"""{"phase":"$phase","rate":$rate,"phase_secs":$secs,"heap_mb":$heapMb,""" +
        s""""batches":${meas.size},"first_batch_id":${meas.head.batchId},""" +
        s""""last_batch_id":${meas.last.batchId},""" +
        s""""input_rows":${meas.map(_.numInputRows).sum},""" +
        s""""in_rows_per_sec":${"%.2f".format(meas.map(_.numInputRows).sum * 1000.0 / spanMs)},""" +
        s""""trigger_p50_ms":${pct(0.50)},"trigger_p95_ms":${pct(0.95)},""" +
        s""""state_rows_first":${stateRows(0)},"state_rows_last":${stateRows(meas.size - 1)}}"""
    val fw = new java.io.PrintWriter(out)
    try fw.println(doc) finally fw.close()
    println(doc)

    if (phase == "phase1") {
      // THE KILL: no stop(), no shutdown hooks, no native teardown —
      // the in-flight batch dies uncommitted, like a lost executor
      Runtime.getRuntime.halt(0)
    } else {
      try q.stop() catch { case _: Throwable => () }
      spark.stop()
    }
  }
}
