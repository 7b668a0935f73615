package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** RocksDB large-state streaming soak (r9 verdict item 4) — the last
  * untested 100 TB posture: keyed state DELIBERATELY larger than the
  * JVM heap, plus a kill-and-restart recovery from the checkpoint.
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
  * e.g. 150k rows/s × 300 s = 45M keys on a 4 g heap (the HDFS
  * provider's per-row heap cost is ~100+ bytes → it would need ≥
  * several GB of heap for the maps alone, plus old snapshots pinned
  * for maintenance).
  *
  * Recovery proof: the first query is stopped MID-RUN (stop()
  * interrupts the in-flight batch — the abort path), a second query
  * starts from the SAME checkpoint, and the record asserts
  * (a) it resumes at a later batchId (not batch 0),
  * (b) its first measured state-row count ≥ the pre-kill count
  *     (state survived the restart; nothing was reset), and
  * (c) state keeps growing at the nominal rate afterwards (the
  *     replayed-uncommitted-batch overlap self-heals: distinct keys
  *     are idempotent in the state store).
  *
  * Emits one JSON doc (default
  * `bench_baselines/r10_streaming_rocksdb.json`) with both phases'
  * rates/latency/state telemetry and the recovery verdicts.
  */
object StreamSoak {

  private final case class Phase(
      batches: Int, firstBatchId: Long, lastBatchId: Long,
      inputRows: Long, inRps: Double, trigP50Ms: Long, trigP95Ms: Long,
      stateRowsFirst: Long, stateRowsLast: Long)

  private def runPhase(
      spark: SparkSession, rate: Long, secs: Int, ckpt: String): Phase = {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", 8)
      .load()
      .select(col("value").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("update")
      .format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("2 seconds"))
      .start()
    Thread.sleep(secs * 1000L)
    val progress = q.recentProgress.toSeq
    // stop() interrupts the in-flight batch — deliberately: the
    // uncommitted batch is the crash this soak's restart then recovers
    // from (its offsets were never committed, so the second phase
    // replays it; distinct-key state absorbs the replay idempotently)
    try q.stop() catch { case _: Throwable => () }
    val meas = progress.filter(_.numInputRows > 0)
    require(meas.nonEmpty, s"no batches measured in phase at rate=$rate")
    def instant(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    val spanMs = math.max(2000L,
      instant(meas.last.timestamp) - instant(meas.head.timestamp) + 2000L)
    val trig = meas.flatMap(p => Option(p.durationMs.get("triggerExecution"))
      .map(_.toLong)).sorted
    def pct(p: Double): Long =
      if (trig.isEmpty) 0L else trig(math.min(trig.size - 1, (p * trig.size).toInt))
    def stateRows(i: Int): Long = meas(i).stateOperators.toSeq.map(_.numRowsTotal).sum
    Phase(
      batches = meas.size,
      firstBatchId = meas.head.batchId, lastBatchId = meas.last.batchId,
      inputRows = meas.map(_.numInputRows).sum,
      inRps = meas.map(_.numInputRows).sum * 1000.0 / spanMs,
      trigP50Ms = pct(0.50), trigP95Ms = pct(0.95),
      stateRowsFirst = stateRows(0), stateRowsLast = stateRows(meas.size - 1))
  }

  private def json(p: Phase): String =
    s"""{"batches":${p.batches},"first_batch_id":${p.firstBatchId},""" +
      s""""last_batch_id":${p.lastBatchId},"input_rows":${p.inputRows},""" +
      s""""in_rows_per_sec":${"%.2f".format(p.inRps)},""" +
      s""""trigger_p50_ms":${p.trigP50Ms},"trigger_p95_ms":${p.trigP95Ms},""" +
      s""""state_rows_first":${p.stateRowsFirst},"state_rows_last":${p.stateRowsLast}}"""

  def main(args: Array[String]): Unit = {
    val rate = sys.env.getOrElse("SPARK_GRAFT_SOAK_RATE", "150000").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_SOAK_SECS", "150").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = args.headOption.getOrElse("bench_baselines/r10_streaming_rocksdb.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 8 shuffle partitions = 8 RocksDB instances: state-store count
      // scales memtable/native memory, and a soak's state is keyed, not
      // compute-bound — fewer, bigger stores is the right shape here
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("streamsoak").toString
    val ckpt = s"$tmp/ckpt"
    val heapMb = Runtime.getRuntime.maxMemory() / 1048576

    val p1 = runPhase(spark, rate, secs, ckpt)
    val p2 = runPhase(spark, rate, secs, ckpt) // SAME checkpoint: recovery
    val resumed = p2.firstBatchId > p1.lastBatchId
    val statePreserved = p2.stateRowsFirst >= p1.stateRowsLast
    val grewAfter = p2.stateRowsLast > p2.stateRowsFirst + (rate * secs) / 2
    val stateOverHeap =
      p2.stateRowsLast.toDouble * 100 / 1048576 > heapMb // ≥100 B/key est.
    val doc =
      s"""{"metric":"streaming_rocksdb_soak","rate":$rate,"phase_secs":$secs,""" +
        s""""provider":"RocksDBStateStoreProvider","heap_mb":$heapMb,""" +
        s""""pipeline":"rate -> groupBy(distinct key).count update-mode -> noop; kill mid-run; restart same checkpoint",""" +
        s""""phase1":${json(p1)},"phase2":${json(p2)},""" +
        s""""recovery":{"resumed_past_batch":$resumed,""" +
        s""""state_preserved":$statePreserved,"grew_after_restart":$grewAfter},""" +
        s""""final_state_rows":${p2.stateRowsLast},""" +
        s""""state_est_over_heap":$stateOverHeap}"""
    val fw = new java.io.PrintWriter(out)
    try fw.println(doc) finally fw.close()
    println(doc)
    spark.stop()
  }
}
