package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowed aggregation over the events table, written once
  * and used from BOTH batch and Structured Streaming — the transform is a
  * pure LogicalPlan function, so `spark.read` and `spark.readStream`
  * inputs get the identical query (Spark's batch/stream unification).
  *
  * In streaming mode the caller adds `withWatermark` before this
  * transform (see `windowedCountsStreaming`); state then evicts closed
  * windows instead of growing forever — mandatory on an unbounded
  * 100 TB/day event feed.
  */
object EventStream {

  /** Tumbling event-time windows per event type: volume + exact-milli
    * value sums. Window start/end surfaced as formatted strings so
    * results are engine-portable.
    */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("value_milli"))

  /** Sliding (hopping) windows: length/slide overlapping windows, each
    * event voting into length÷slide of them. Spark's `window(ts, len,
    * slide)` generator expands the memberships at the scan — the shuffle
    * then carries (window, type) partial aggregates only, so overlap
    * multiplies map-side work, never exchange volume. Same schema as the
    * tumbling [[windowedAgg]]; works identically under `readStream` with
    * a watermark.
    */
  def slidingWindowAgg(
      events: DataFrame, windowLength: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength, slide).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("value_milli"))

  /** Streaming variant: bounded state via watermark. */
  def windowedAggStreaming(
      events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), windowLength)

  // ---------------------------------------- stateful sessionization

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session accumulator kept in the state store, epoch millis. */
  final case class SessionAcc(startMs: Long, endMs: Long, n: Long, valueMilli: Long)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, value_milli: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-state API the built-in `session_window` can't cover when
    * session logic grows beyond a fixed gap (caps, per-user gaps,
    * value-dependent closure…). State per user is ONE open session
    * (bounded memory); sessions closed by a later in-batch event are
    * emitted immediately, trailing sessions are emitted by event-time
    * timeout once the watermark passes end + gap — which also bounds
    * state lifetime on an unbounded feed.
    */
  def sessionizeWithState(
      events: Dataset[SessionEvent], gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMillis = gapMinutes * 60000L

    def fn(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionAcc]): Iterator[SessionOut] = {
      def out(a: SessionAcc): SessionOut = SessionOut(
        userId, new Timestamp(a.startMs), new Timestamp(a.endMs), a.n, a.valueMilli)
      if (state.hasTimedOut) {
        val closed = state.getOption.map(out).iterator
        state.remove()
        closed
      } else {
        val sorted = it.toArray.sortBy(_.ts.getTime)
        val closed = scala.collection.mutable.ArrayBuffer.empty[SessionAcc]
        var acc = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          val vm = math.round(e.value * 1000)
          acc match {
            case Some(a) if t - a.endMs <= gapMillis =>
              acc = Some(SessionAcc(a.startMs, math.max(a.endMs, t), a.n + 1, a.valueMilli + vm))
            case Some(a) =>
              closed += a
              acc = Some(SessionAcc(t, t, 1L, vm))
            case None =>
              acc = Some(SessionAcc(t, t, 1L, vm))
          }
        }
        acc.foreach { a =>
          state.update(a)
          state.setTimeoutTimestamp(a.endMs + gapMillis)
        }
        closed.iterator.map(out)
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup with BOUNDED state: duplicate `idCol` rows
    * arriving within the watermark horizon are dropped, and the
    * dedup-state for ids older than the watermark is evicted — the
    * at-least-once-source → exactly-once-pipeline building block.
    * (Plain `dropDuplicates` on a stream would keep every id forever.)
    */
  def dedupStream(
      events: DataFrame, idCol: String = "event_id",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** `foreachBatch` keyed upsert into a BUCKETED parquet state store —
    * latest row per key wins (CDC-style compaction the plain file sink
    * can't express; a merge-capable table format replaces this layout in
    * production, the batch logic is the same).
    *
    * State layout: `state/b<bucket>/g<gen>/part-*.parquet`, bucket =
    * `pmod(xxhash64(key), numBuckets)`, plus a one-line-per-bucket
    * `MANIFEST` naming each bucket's current generation.
    *
    * Scale shape — the two r2 defects fixed here:
    *  1. PRUNED REWRITE: a micro-batch reads and rewrites ONLY the
    *     buckets its keys hash into (≤ |batch keys| of them), not the
    *     whole state — r2 rewrote O(|state|) per batch, so the sink fell
    *     behind its input once state outgrew the batch rate.
    *  2. CRASH-SAFE PROMOTE: new generations are written to fresh
    *     directories (never touching live files), then ONE atomic
    *     manifest rename makes them current — the Iceberg-style
    *     snapshot-pointer pattern. r2 deleted live state before the
    *     rename; a crash in between lost everything. Now a crash at any
    *     point leaves the manifest naming only complete generations;
    *     leftover `.tmp`/orphan gens are swept on the next batch, and a
    *     replayed batchId (foreachBatch redelivery after restart)
    *     re-produces the identical generation — idempotent.
    *
    * Read the state back with [[readUpsertState]] (a raw recursive read
    * of the directory could see an orphan generation mid-recovery).
    */
  def upsertBatch(
      state: String, key: String, tsCol: String, numBuckets: Int = 16)(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val root = Paths.get(state)
    Files.createDirectories(root)
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
      }

    val manifest = readManifest(state)
    val bucketOf = pmod(xxhash64(col(key)), lit(numBuckets)).cast("int")
    // persist: the batch is consumed TWICE (touched-bucket discovery,
    // then the merge write). Unpersisted, each consumption replays the
    // micro-batch source scan — double input I/O per batch at scale,
    // and double-counted numInputRows in StreamingQueryProgress (how
    // the telemetry spec caught this).
    val bucketed = batch.withColumn("__b", bucketOf).persist()
    try {
      upsertBucketed(spark, bucketed, bucketOf, state, key, tsCol, batchId,
        manifest, rmTree)
    } finally bucketed.unpersist(blocking = false)
  }

  private def upsertBucketed(
      spark: org.apache.spark.sql.SparkSession, bucketed: DataFrame,
      bucketOf: Column, state: String, key: String, tsCol: String, batchId: Long,
      manifest: Map[Int, Long], rmTree: java.nio.file.Path => Unit): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.expressions.Window
    val root = Paths.get(state)
    val touched = bucketed.select("__b").distinct()
      .collect().map(_.getInt(0)).sorted // ≤ numBuckets values — driver-safe
    if (touched.isEmpty) return

    // current generations of ONLY the touched buckets (exists-filter
    // tolerates a crash that promoted the manifest mid-GC)
    val existingPaths = touched.toSeq
      .flatMap(b => manifest.get(b).map(g => s"$state/b$b/g$g"))
      .filter(p => Files.exists(Paths.get(p)))
    val existing =
      if (existingPaths.nonEmpty)
        spark.read.parquet(existingPaths: _*).withColumn("__b", bucketOf)
      else bucketed.limit(0)

    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).desc, col("__gen").desc)
    val merged = existing.withColumn("__gen", lit(0))
      .unionByName(bucketed.withColumn("__gen", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__gen")

    // write new generations off to the side, one dir per touched bucket
    val tmp = s"$state/.tmp-$batchId"
    rmTree(Paths.get(tmp)) // leftover from a crashed attempt of this batch
    merged.write.mode("overwrite").partitionBy("__b").parquet(tmp)
    touched.zipWithIndex.foreach { case (b, i) =>
      val src = Paths.get(s"$tmp/__b=$b")
      Files.createDirectories(Paths.get(s"$state/b$b"))
      val dst = Paths.get(s"$state/b$b/g$batchId")
      rmTree(dst) // crashed earlier attempt of this same batch
      if (Files.exists(src)) Files.move(src, dst)
      if (i == 0) killPoint("mid_stage") // after the FIRST gen move only
    }
    killPoint("post_stage") // all gens staged, manifest not yet promoted

    // ONE atomic rename promotes all new generations together
    val newManifest = manifest ++ touched.map(_ -> batchId)
    val tmpManifest = root.resolve("MANIFEST.tmp")
    Files.writeString(tmpManifest,
      newManifest.toSeq.sorted.map { case (b, g) => s"$b,$g" }.mkString("\n"))
    Files.move(tmpManifest, root.resolve("MANIFEST"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    killPoint("post_promote") // promoted; superseded gens not yet GC'd

    // GC superseded generations + the tmp dir (post-promote: a crash
    // here only leaves orphans, never dangling manifest entries)
    touched.foreach { b =>
      manifest.get(b).filter(_ != batchId)
        .foreach(g => rmTree(Paths.get(s"$state/b$b/g$g")))
    }
    rmTree(Paths.get(tmp))
  }

  /** TEST-ONLY crash injection (UpsertFaultSpec): `halt()` the JVM —
    * no shutdown hooks, no finally blocks — at a named point of the
    * stage→promote protocol. The spec sets `GRAFT_UPSERT_KILL_POINT` in
    * a CHILD process's environment; unset (every production run), this
    * is a map lookup and nothing more.
    */
  private def killPoint(name: String): Unit =
    if (sys.env.get("GRAFT_UPSERT_KILL_POINT").contains(name))
      Runtime.getRuntime.halt(137)

  private def readManifest(state: String): Map[Int, Long] = {
    import java.nio.file.{Files, Paths}
    val m = Paths.get(state, "MANIFEST")
    if (!Files.exists(m)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(m).asScala.filter(_.nonEmpty).map { line =>
        val Array(b, g) = line.split(",")
        b.toInt -> g.toLong
      }.toMap
    }
  }

  /** Current upsert-state snapshot: exactly the generations the manifest
    * names — never a mid-recovery orphan or superseded generation.
    */
  def readUpsertState(spark: org.apache.spark.sql.SparkSession, state: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val paths = readManifest(state).toSeq.sorted
      .map { case (b, g) => s"$state/b$b/g$g" }
      .filter(p => Files.exists(Paths.get(p)))
    require(paths.nonEmpty, s"no upsert state at $state")
    spark.read.parquet(paths: _*)
  }

  /** Stream-stream interval join: each click joined to the same user's
    * views from the preceding `withinMinutes` — attribution joins on
    * two live feeds. Both sides carry watermarks and the join condition
    * bounds the event-time distance, so Spark can evict buffered rows
    * once the watermark passes their join window: bounded state on two
    * unbounded inputs (without the time bound the state would grow
    * forever — Spark rejects such joins in append mode).
    */
  /** @param joinType "inner" (default) or "left_outer". LEFT OUTER is
    *                  the attribution-with-nulls variant: a click with
    *                  no in-window view still emits, with null view
    *                  columns — but only once the watermark passes the
    *                  click's join window, because until then a
    *                  matching view could still arrive. (That delayed
    *                  null emission is THE semantic difference between
    *                  outer stream-stream joins and batch outer joins —
    *                  proven in StreamingSpec.)
    */
  def clickViewIntervalJoin(
      clicks: DataFrame, views: DataFrame,
      withinMinutes: Int = 30, watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v,
      col("c_user") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("view_ts") <= col("click_ts"),
      joinType)
  }

  /** One stateful operator's state-store footprint at a point in time.
    * `rowsTotal` is the live state size — the number THE WATERMARK must
    * keep bounded; `rowsRemoved` counts evictions in that batch.
    */
  final case class StateOpStats(
      operatorName: String, batchId: Long,
      rowsTotal: Long, rowsUpdated: Long, rowsRemoved: Long,
      memoryUsedBytes: Long)

  /** State-store telemetry across a streaming query's retained progress
    * history: one row per (micro-batch, stateful operator). This is the
    * operational signal for "is my watermark actually bounding state" —
    * on an unbounded feed, `rowsTotal` plateauing (and `rowsRemoved`
    * firing as windows close) is the difference between a healthy job
    * and one that OOMs an executor a week in. Pure read of the
    * driver-side progress objects: zero cost to the stream itself.
    */
  def stateTelemetry(
      q: org.apache.spark.sql.streaming.StreamingQuery): Seq[StateOpStats] =
    q.recentProgress.toSeq.flatMap { p =>
      p.stateOperators.toSeq.map { so =>
        StateOpStats(so.operatorName, p.batchId, so.numRowsTotal,
          so.numRowsUpdated, so.numRowsRemoved, so.memoryUsedBytes)
      }
    }

  /** Per-user session stats with a session-window (gap-based) —
    * the streaming-native sessionization the reference's batch world has
    * no equivalent for.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("user_id"), col("n_events"), col("value_milli"))
}
