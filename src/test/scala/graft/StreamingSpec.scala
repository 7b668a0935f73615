package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (ts, event_type, value, user_id)
  private def rows: Seq[(Timestamp, String, Double, Long)] = Seq(
    (ts("2024-01-01 10:05:00"), "click", 1.5, 1L),
    (ts("2024-01-01 10:45:00"), "click", 2.5, 2L),
    (ts("2024-01-01 11:05:00"), "view", 4.0, 1L),
    (ts("2024-01-01 11:20:00"), "click", 8.0, 3L))

  test("streaming windowed agg matches the batch transform on same rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    stream.addData(rows)
    val streamDf = stream.toDF().toDF("ts", "event_type", "value", "user_id")

    val q = EventStream.windowedAggStreaming(streamDf, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_agg")
      .select("window_start", "event_type", "n_events", "value_milli")
      .as[(String, String, Long, Long)].collect().toSet

    val batch = EventStream.windowedAgg(
        rows.toDF("ts", "event_type", "value", "user_id"), "1 hour")
      .as[(String, String, Long, Long)].collect().toSet

    assert(streamed === batch)
    assert(batch.contains(("2024-01-01 10:00:00", "click", 2L, 4000L)))
  }

  test("sliding windows stream: every event lands in both overlapping windows, stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    stream.addData(rows)
    val streamDf = stream.toDF().toDF("ts", "event_type", "value", "user_id")

    val q = EventStream.slidingWindowAgg(
        streamDf.withWatermark("ts", "2 hours"), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("slide_agg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("slide_agg")
      .as[(String, String, Long, Long)].collect().toSet
    val batch = EventStream.slidingWindowAgg(
        rows.toDF("ts", "event_type", "value", "user_id"), "1 hour", "30 minutes")
      .as[(String, String, Long, Long)].collect().toSet
    assert(streamed === batch)
    // 10:45 click is a member of BOTH the 10:00 and 10:30 hour-long
    // windows (the 10:30 one also picks up the 11:20 click)
    assert(batch.contains(("2024-01-01 10:00:00", "click", 2L, 4000L)))
    assert(batch.contains(("2024-01-01 10:30:00", "click", 2L, 10500L)))
  }

  test("append mode: watermark finalizes windows and DROPS late events (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = stream.toDF().toDF("ts", "event_type", "value", "user_id")
    val q = EventStream.windowedAggStreaming(streamDf, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("evict_agg")
      .outputMode("append").start()
    try {
      // batch 1: three rows in [10:00, 11:00) + a marker far ahead that
      // pushes the watermark to 11:30 (13:30 − 2h) after the batch
      stream.addData(Seq(
        (ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
        (ts("2024-01-01 10:15:00"), "click", 2.0, 2L),
        (ts("2024-01-01 10:25:00"), "click", 4.0, 3L),
        (ts("2024-01-01 13:30:00"), "marker", 0.0, 9L)))
      q.processAllAvailable()
      // batch 2: the watermark now exceeds the window end, so the
      // [10:00, 11:00) window is finalized and emitted
      stream.addData(Seq((ts("2024-01-01 14:00:00"), "marker", 0.0, 9L)))
      q.processAllAvailable()
      val afterClose = spark.table("evict_agg")
        .select("window_start", "event_type", "n_events", "value_milli")
        .as[(String, String, Long, Long)].collect().toSet
      assert(afterClose.contains(("2024-01-01 10:00:00", "click", 3L, 7000L)),
        s"closed window must be emitted exactly once, got $afterClose")

      // batch 3: a LATE click at 10:45 — behind the watermark, its
      // window is already finalized; state was evicted, the row dropped
      stream.addData(Seq((ts("2024-01-01 10:45:00"), "click", 8.0, 4L)))
      q.processAllAvailable()
      stream.addData(Seq((ts("2024-01-01 15:30:00"), "marker", 0.0, 9L)))
      q.processAllAvailable()
      val afterLate = spark.table("evict_agg")
        .filter($"window_start" === "2024-01-01 10:00:00" && $"event_type" === "click")
        .select("n_events", "value_milli").as[(Long, Long)].collect().toSeq
      assert(afterLate === Seq((3L, 7000L)),
        "late event beyond the watermark must not re-open or re-emit the window")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: in-batch closure + timeout emission") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val sessions = EventStream.sessionizeWithState(
      stream.toDF().toDF("user_id", "ts", "value").as[EventStream.SessionEvent],
      gapMinutes = 30, watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session); user 2: one event
      stream.addData(Seq(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:10:00"), 2.0),
        (2L, ts("2024-01-01 10:05:00"), 4.0)))
      q.processAllAvailable()
      // user 1 reappears much later: closes their first session in-batch,
      // and pushes the watermark to 14:00 on batch completion
      stream.addData(Seq((1L, ts("2024-01-01 15:00:00"), 8.0)))
      q.processAllAvailable()
      // one more batch so user 2's (10:35) timeout < watermark fires
      stream.addData(Seq((9L, ts("2024-01-01 16:00:00"), 0.0)))
      q.processAllAvailable()

      val got = spark.table("state_sessions")
        .select("user_id", "session_start", "session_end", "n_events", "value_milli")
        .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
      assert(got.contains(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3000L)),
        s"user 1 first session must be closed by the in-batch gap, got $got")
      assert(got.contains(
        (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L, 4000L)),
        s"user 2 session must be emitted via event-time timeout, got $got")
    } finally q.stop()
  }

  test("stream-static join: live events enriched by a batch dim, broadcast per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    // static dim: user tiers (the dimension a 100 TB stream enriches
    // against — broadcast into every micro-batch, no stream-side state)
    val dim = Seq((1L, "gold"), (2L, "basic"), (3L, "basic"))
      .toDF("user_id", "tier")
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = stream.toDF().toDF("ts", "event_type", "value", "user_id")

    import org.apache.spark.sql.functions.{broadcast, col, count, lit, sum, round}
    val q = streamDf.join(broadcast(dim), Seq("user_id"), "left")
      .groupBy(col("tier")).agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("vm"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("complete").start()
    try {
      stream.addData(rows :+ (ts("2024-01-01 12:00:00"), "click", 1.0, 99L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("enriched")
      .as[(Option[String], Long, Long)].collect().toSet
    // rows: u1 ×2 (gold), u2 + u3 (basic), unknown user 99 → null tier
    assert(got === Set(
      (Some("gold"), 2L, 5500L),
      (Some("basic"), 2L, 10500L),
      (None, 1L, 1000L)))
  }

  test("stream-stream interval join matches only views within the window, per user") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)] // (event_id, ts, user_id)
    val views = MemoryStream[(Long, Timestamp, Long)]
    def df(s: MemoryStream[(Long, Timestamp, Long)]) =
      s.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStream.clickViewIntervalJoin(df(clicks), df(views), withinMinutes = 30)
      .select("click_id", "view_id")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      views.addData(Seq(
        (100L, ts("2024-01-01 10:00:00"), 1L), // within 30 min of click 1
        (101L, ts("2024-01-01 08:00:00"), 1L), // too old
        (102L, ts("2024-01-01 10:10:00"), 2L)  // other user
      ))
      clicks.addData(Seq((1L, ts("2024-01-01 10:20:00"), 1L)))
      q.processAllAvailable()
      // push watermarks forward so results flush in append mode
      views.addData(Seq((199L, ts("2024-01-01 15:00:00"), 9L)))
      clicks.addData(Seq((99L, ts("2024-01-01 15:00:00"), 9L)))
      q.processAllAvailable()
      val got = spark.table("ss_join").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 100L)), s"in-window view must join, got $got")
      assert(!got.exists(_._2 == 101L), "view older than the window must not join")
      assert(!got.exists(_._2 == 102L), "other user's view must not join")
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join: unmatched click emits nulls only after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    def df(s: MemoryStream[(Long, Timestamp, Long)]) =
      s.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStream.clickViewIntervalJoin(
        df(clicks), df(views), withinMinutes = 30, joinType = "left_outer")
      .select("click_id", "view_id")
      .writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").start()
    try {
      // click 1 has a view; click 2 has NONE
      views.addData(Seq((100L, ts("2024-01-01 10:00:00"), 1L)))
      clicks.addData(Seq(
        (1L, ts("2024-01-01 10:20:00"), 1L),
        (2L, ts("2024-01-01 10:20:00"), 2L)))
      q.processAllAvailable()
      val early = spark.table("ss_outer")
        .as[(Long, Option[Long])].collect().toSet
      // the unmatched click must NOT have emitted yet — a matching view
      // could still arrive until the watermark passes its window
      assert(!early.exists(_._1 == 2L),
        s"unmatched click emitted before watermark closed its window: $early")

      // advance both watermarks far past the window
      views.addData(Seq((199L, ts("2024-01-01 15:00:00"), 9L)))
      clicks.addData(Seq((99L, ts("2024-01-01 15:00:00"), 9L)))
      q.processAllAvailable()
      // one more nudge: outer-join null emission happens when the
      // watermark ADVANCES, which Spark evaluates on the next batch
      views.addData(Seq((198L, ts("2024-01-01 16:00:00"), 9L)))
      clicks.addData(Seq((98L, ts("2024-01-01 16:00:00"), 9L)))
      q.processAllAvailable()

      val got = spark.table("ss_outer").as[(Long, Option[Long])].collect().toSet
      assert(got.contains((1L, Some(100L))), s"matched pair missing: $got")
      assert(got.contains((2L, None)),
        s"unmatched click must emit with null view after watermark: $got")
    } finally q.stop()
  }

  test("checkpointed file sink: restart resumes exactly-once (no re-emitted batches)") {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    def start() = stream.toDF().toDF("ts", "event_type", "value", "user_id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    stream.addData(Seq(
      (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      (ts("2024-01-01 10:01:00"), "click", 2.0, 2L)))
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() === 2)

    // restart from the checkpoint; only NEW data may land in the sink
    val q2 = start()
    stream.addData(Seq((ts("2024-01-01 10:02:00"), "click", 4.0, 3L)))
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
      .select("user_id").as[Long].collect().sorted
    assert(rows === Array(1L, 2L, 3L),
      "batch 1 must not be re-emitted after restart")
  }

  test("dedupStream drops within-watermark duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)] // (event_id, ts, value)
    val q = EventStream.dedupStream(
        stream.toDF().toDF("event_id", "ts", "value"), "event_id", "1 hour")
      .select("event_id", "value")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:01:00"), 2.0)))
      q.processAllAvailable()
      // batch 2: id 1 re-delivered (at-least-once source), id 3 new
      stream.addData(Seq(
        (1L, ts("2024-01-01 10:02:00"), 99.0),
        (3L, ts("2024-01-01 10:03:00"), 3.0)))
      q.processAllAvailable()
      val got = spark.table("dedup_stream").as[(Long, Double)].collect().sorted
      assert(got === Array((1L, 1.0), (2L, 2.0), (3L, 3.0)),
        "the re-delivered id must be dropped, first delivery wins")
    } finally q.stop()
  }

  test("foreachBatch keyed upsert: latest row per key wins across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    val state = Files.createTempDirectory("graft-upsert").toString + "/state"
    val stream = MemoryStream[(Long, Timestamp, Double)] // (key, ts, value)
    val q = stream.toDF().toDF("k", "ts", "v")
      .writeStream
      .foreachBatch(EventStream.upsertBatch(state, "k", "ts") _)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-upsert-ckpt").toString)
      .start()
    try {
      stream.addData(Seq(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:00:00"), 2.0)))
      q.processAllAvailable()
      // batch 2: newer row for key 1, older (stale) row for key 2, new key 3
      stream.addData(Seq(
        (1L, ts("2024-01-01 11:00:00"), 10.0),
        (2L, ts("2024-01-01 09:00:00"), 99.0),
        (3L, ts("2024-01-01 10:30:00"), 3.0)))
      q.processAllAvailable()
      val got = EventStream.readUpsertState(spark, state)
        .select("k", "v").as[(Long, Double)].collect().toMap
      assert(got === Map(1L -> 10.0, 2L -> 2.0, 3L -> 3.0),
        "newer wins, stale update ignored, new key inserted")
    } finally q.stop()
  }

  test("streaming upsert state == batch latest-per-key over the same rows (cross-paradigm)") {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, max, struct, unix_millis}
    val state = Files.createTempDirectory("graft-upsert-eq").toString + "/state"
    val rnd = new scala.util.Random(7L)
    val all = (1 to 200).map { i =>
      (rnd.nextInt(30).toLong,
        new Timestamp(ts("2024-01-01 00:00:00").getTime + rnd.nextInt(86400) * 1000L),
        i.toDouble)
    }
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val q = stream.toDF().toDF("k", "ts", "v")
      .writeStream
      .foreachBatch(EventStream.upsertBatch(state, "k", "ts") _)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-upsert-eq-ckpt").toString)
      .start()
    try {
      all.grouped(70).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = EventStream.readUpsertState(spark, state)
      .select("k", "v").as[(Long, Double)].collect().toSet
    // the batch formulation of the same contract — latest (ts, then
    // value as the sink's own arrival tiebreak is ts-only, so make the
    // oracle insensitive: no duplicate (k, ts) pairs exist by design
    val batch = all.toDF("k", "ts", "v")
      .groupBy(col("k"))
      .agg(max(struct(unix_millis(col("ts")).as("ms"), col("v"))).as("last"))
      .select(col("k"), col("last.v"))
      .as[(Long, Double)].collect().toSet
    assert(all.map(r => (r._1, r._2)).distinct.length ===
      all.map(r => (r._1, r._2)).length, "setup: (k, ts) unique")
    assert(streamed === batch,
      "the streaming sink and the batch latest-per-key must agree row-for-row")
  }

  test("upsert sink: a 1-key batch rewrites only that key's bucket") {
    import java.nio.file.{Files, Paths}
    val state = Files.createTempDirectory("graft-upsert-prune").toString + "/state"
    val B = 8
    // batch 0: 64 keys → every bucket populated
    val batch0 = (1L to 64L).map(k => (k, ts("2024-01-01 10:00:00"), k.toDouble))
      .toDF("k", "ts", "v")
    EventStream.upsertBatch(state, "k", "ts", B)(batch0, 0L)
    def manifest() = Files.readAllLines(Paths.get(state, "MANIFEST"))
    assert(manifest().size === B, "64 xxhash64-spread keys must hit all 8 buckets")
    val files0 = Files.walk(Paths.get(state)).filter(_.toString.endsWith(".parquet"))
      .map[String](_.toString).toList
    // batch 1: ONE key updated
    EventStream.upsertBatch(state, "k", "ts", B)(
      Seq((7L, ts("2024-01-01 11:00:00"), 700.0)).toDF("k", "ts", "v"), 1L)
    import scala.jdk.CollectionConverters._
    val gens = manifest().asScala.map(_.split(",")).map(a => a(0).toInt -> a(1).toLong).toMap
    assert(gens.values.count(_ == 1L) === 1,
      s"exactly one bucket may advance to generation 1, got $gens")
    val advanced = gens.collectFirst { case (b, 1L) => b }.get
    val files1 = Files.walk(Paths.get(state)).filter(_.toString.endsWith(".parquet"))
      .map[String](_.toString).toList
    val removed = files0.asScala.toSet.diff(files1.asScala.toSet)
    val added = files1.asScala.toSet.diff(files0.asScala.toSet)
    assert((removed ++ added).forall(_.contains(s"/b$advanced/")),
      s"only bucket $advanced's files may change; changed: ${removed ++ added}")
    assert(removed.nonEmpty && added.nonEmpty)
    val got = EventStream.readUpsertState(spark, state)
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(got.size === 64 && got(7L) === 700.0 && got(8L) === 8.0)
  }

  test("streaming text-kernel scoring == batch on the same docs (quality/lang-id/tokens/simhash)") {
    // the ingest-time scoring pattern: quality gates run INSIDE the
    // streaming pipeline, not as a later batch sweep. The text kernels
    // (incl. the custom codegen'd simhash/rolling-hash expressions)
    // are stateless scalars, so stream output must equal the batch
    // computation row-for-row — this pins that the custom Catalyst
    // expressions evaluate identically under streaming execution.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.ops.TextAnalysis
    import graft.functions.exprs
    val docs = graft.sources.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text")).limit(30)
      .as[(Long, String)].collect().toSeq

    def score(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tok"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langIdHeuristic(col("text")).as("lang"),
        exprs.simhash64(col("text")).as("sh"),
        exprs.rolling_hash(col("text")).as("rh"))

    val stream = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = score(stream.toDF().toDF("doc_id", "text"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        collected.synchronized { collected ++= b.collect() }; ()
      }
      .start()
    try {
      docs.grouped(12).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
    } finally q.stop()

    val streamed = collected.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getString(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    val batch = score(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Double, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed.toSeq === batch,
      "text kernels must score identically under streaming and batch execution")
  }

  test("Trigger.AvailableNow: a restarted query processes ONLY files that arrived since") {
    // the one-shot incremental-batch mode a 100 TB pipeline runs on a
    // schedule: drain everything available, checkpoint, exit; the next
    // run resumes from the checkpoint and touches only NEW input.
    // Restart-must-not-reprocess is the property that makes scheduled
    // catch-up runs idempotent-cost, not O(total history) each time.
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val src = Files.createTempDirectory("graft-an-src").toString
    val ckpt = Files.createTempDirectory("graft-an-ckpt").toString
    val schema = StructType(Seq(StructField("v", LongType)))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]

    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.synchronized {
            seen += ((id, batch.select(col("v")).collect().map(_.getLong(0)).toSeq.sorted))
          }; ()
        }
        .start()
      q.awaitTermination()
    }

    Seq(1L, 2L, 3L).toDF("v").write.mode("append").parquet(src)
    drain()
    val firstRun = seen.flatMap(_._2).sorted.toSeq
    assert(firstRun === Seq(1L, 2L, 3L))

    seen.clear()
    Seq(10L, 11L).toDF("v").write.mode("append").parquet(src)
    drain()
    val secondRun = seen.flatMap(_._2).sorted.toSeq
    assert(secondRun === Seq(10L, 11L),
      "the restart must process only the files added after the first drain")
  }

  test("upsert sink: query progress exposes per-batch row counts and monotone batch ids") {
    // the operational contract a 100 TB operator watches: every
    // micro-batch reports its input volume through StreamingQueryProgress
    // (rows in == rows sent), batch ids advance monotonically, and the
    // sink identifies itself — the signals a lag/throughput monitor and
    // the backpressure loop are built on. foreachBatch sinks report like
    // any other sink; nothing about the custom upsert hides telemetry.
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    val state = Files.createTempDirectory("graft-upsert-prog").toString + "/state"
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val q = stream.toDF().toDF("k", "ts", "v")
      .writeStream
      .foreachBatch(EventStream.upsertBatch(state, "k", "ts") _)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-upsert-prog-ckpt").toString)
      .start()
    try {
      stream.addData(Seq(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:00:00"), 2.0),
        (3L, ts("2024-01-01 10:00:00"), 3.0)))
      q.processAllAvailable()
      stream.addData(Seq((1L, ts("2024-01-01 11:00:00"), 10.0)))
      q.processAllAvailable()

      val progress = q.recentProgress.filter(_.numInputRows > 0)
      assert(progress.length === 2, s"expected 2 data batches, saw ${progress.length}")
      assert(progress.map(_.numInputRows).toSeq === Seq(3L, 1L),
        "per-batch numInputRows must match the rows fed to each batch")
      val ids = progress.map(_.batchId).toSeq
      assert(ids === ids.sorted && ids.distinct === ids,
        s"batch ids must advance monotonically, saw $ids")
      assert(progress.forall(_.sink.description.contains("ForeachBatch")),
        "sink telemetry must identify the foreachBatch sink")
      assert(progress.forall(p => p.durationMs.get("triggerExecution") != null),
        "every batch must report its trigger execution duration")
      // and the sink's own effect matches what telemetry says went in
      val rows = EventStream.readUpsertState(spark, state).count()
      assert(rows === 3L)
    } finally q.stop()
  }

  test("upsert sink: recovery sweeps stale tmp dirs and readers never see orphan generations") {
    import java.nio.file.{Files, Paths}
    val state = Files.createTempDirectory("graft-upsert-crash").toString + "/state"
    EventStream.upsertBatch(state, "k", "ts", 4)(
      Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:00:00"), 2.0)).toDF("k", "ts", "v"), 0L)
    // simulate a crash mid-batch-1: a half-written tmp dir and an orphan
    // generation that was never promoted into the manifest
    val tmp = Paths.get(s"$state/.tmp-1")
    Files.createDirectories(tmp.resolve("__b=0"))
    Files.writeString(tmp.resolve("__b=0/part-garbage.parquet"), "not parquet")
    val orphan = Paths.get(s"$state/b0/g999")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-garbage.parquet"), "not parquet either")
    // the reader ignores both (manifest names only complete generations)
    val before = EventStream.readUpsertState(spark, state)
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(before === Map(1L -> 1.0, 2L -> 2.0))
    // the replayed batch succeeds despite the leftovers
    EventStream.upsertBatch(state, "k", "ts", 4)(
      Seq((1L, ts("2024-01-01 11:00:00"), 10.0)).toDF("k", "ts", "v"), 1L)
    val after = EventStream.readUpsertState(spark, state)
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(after === Map(1L -> 10.0, 2L -> 2.0))
    assert(!Files.exists(tmp), "stale tmp dir for the replayed batch must be swept")
  }

  test("batch q_sessionize == streaming flatMapGroupsWithState sessions on sf0.001 events") {
    // The window-composition batch sessionizer and the stateful
    // streaming sessionizer implement the SAME 30-minute-gap semantics;
    // feeding the whole sf0.001 events table through both must produce
    // identical session sets. Trailing sessions are flushed from the
    // state store by a far-future sentinel event that advances the
    // watermark past every real session's timeout.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val batch = SparkEntry.queries("q_sessionize")(spark, Sf0001)
      .select("user_id", "session_start", "session_end", "n_events", "value_milli")
      .as[(Long, String, String, Long, Long)].collect().toSet

    val events = sources.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventStream.SessionEvent].collect()
    val sentinel = EventStream.SessionEvent(-1L, ts("2099-01-01 00:00:00"), 0.0)
    val stream = MemoryStream[EventStream.SessionEvent]
    val q = EventStream.sessionizeWithState(stream.toDS(), gapMinutes = 30,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      stream.addData(events.toSeq)
      q.processAllAvailable()
      stream.addData(Seq(sentinel))
      q.processAllAvailable()
      // one empty-ish trigger so event-time timeouts fire after the
      // watermark moved; the sentinel's own session stays open
      stream.addData(Seq(EventStream.SessionEvent(-1L, ts("2099-01-01 00:00:01"), 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("sess_parity")
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("e"),
          col("n_events"), col("value_milli"))
        .as[(Long, String, String, Long, Long)].collect().toSet
      assert(streamed.nonEmpty)
      assert(streamed === batch,
        s"batch-only: ${(batch -- streamed).take(3)}; stream-only: ${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("sessionAgg groups events into gap-based sessions") {
    val sessRows = Seq(
      (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      (ts("2024-01-01 10:10:00"), "click", 1.0, 1L), // same session
      (ts("2024-01-01 12:00:00"), "click", 1.0, 1L), // new session
      (ts("2024-01-01 10:00:00"), "view", 1.0, 2L))
    val got = EventStream.sessionAgg(
        sessRows.toDF("ts", "event_type", "value", "user_id"), "30 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    assert(got === Array((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("state telemetry: watermark eviction is visible and state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    val q = EventStream.windowedAggStreaming(
        stream.toDF().toDF("ts", "event_type", "value", "user_id"),
        "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("state_telemetry")
      .outputMode("append").start()
    try {
      // batch 1: two open hourly windows
      stream.addData(Seq(
        (ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
        (ts("2024-01-01 11:05:00"), "click", 1.0, 1L)))
      q.processAllAvailable()
      // batch 2: event time jumps 6 hours — watermark passes both
      // earlier windows, so their state rows must be EVICTED
      stream.addData(Seq((ts("2024-01-01 17:00:00"), "click", 1.0, 1L)))
      q.processAllAvailable()
      stream.addData(Seq((ts("2024-01-01 17:10:00"), "view", 1.0, 2L)))
      q.processAllAvailable()

      val tel = EventStream.stateTelemetry(q)
      assert(tel.nonEmpty, "no state operators reported")
      val agg = tel.filter(_.operatorName == "stateStoreSave")
      assert(agg.nonEmpty, s"no stateStoreSave rows in ${tel.map(_.operatorName).distinct}")
      // eviction observed somewhere in the run...
      assert(agg.map(_.rowsRemoved).sum >= 2,
        s"expected the two closed windows evicted, got $agg")
      // ...and the final state holds only the still-open windows (17:00
      // click + 17:00 view), not everything ever seen
      val lastTotal = agg.maxBy(_.batchId).rowsTotal
      assert(lastTotal <= 2, s"state not bounded: $lastTotal live rows ($agg)")
    } finally q.stop()
  }

  test("native session_window: sessions MERGE across micro-batches, stream == batch") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double, Long)]

    def sessionAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("e"),
        col("n_events"), col("value_milli"))

    val q = sessionAgg(stream.toDF().toDF("ts", "event_type", "value", "user_id"))
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    val all = Seq(
      (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      (ts("2024-01-01 10:20:00"), "view", 2.0, 1L),  // arrives in batch 2,
      (ts("2024-01-01 11:30:00"), "click", 4.0, 1L), // must MERGE into 10:00's session
      (ts("2024-01-01 10:05:00"), "view", 8.0, 2L))
    try {
      stream.addData(Seq(all(0), all(3)))
      q.processAllAvailable()
      stream.addData(Seq(all(1), all(2)))
      q.processAllAvailable()
      val streamed = spark.table("sess_win")
        .as[(Long, String, String, Long, Long)].collect().toSet
      val batch = sessionAgg(all.toDF("ts", "event_type", "value", "user_id"))
        .as[(Long, String, String, Long, Long)].collect().toSet
      assert(streamed === batch,
        "merging-window state machine must converge to the batch answer")
      // the 10:20 event extended user 1's 10:00 session (merge across
      // micro-batches); 11:30 is a separate session
      assert(batch.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:50:00", 2L, 3000L)))
      assert(batch.contains((1L, "2024-01-01 11:30:00", "2024-01-01 12:00:00", 1L, 4000L)))
    } finally q.stop()
  }

  test("streaming JSONL quarantine: all 3 malformed-line policies match batch semantics") {
    // E131's landing-zone reader as a readStream source: a continuously
    // arriving corpus must get the IDENTICAL quarantine semantics the
    // batch path proves in TablesSpec — bad line retained verbatim
    // (PERMISSIVE), skipped (DROPMALFORMED), query-failing (FAILFAST)
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.sources.Tables
    val src = Files.createTempDirectory("graft-jsonl-src")
    Files.writeString(src.resolve("part-0.jsonl"),
      """{"id":1,"name":"alpha"}
        |{"id":2,"name":"beta"
        |{"id":3,"name":"gamma"}
        |""".stripMargin) // line 2 truncated mid-object
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))

    def drain(mode: String, sinkTable: String): Unit = {
      val ckpt = Files.createTempDirectory(s"graft-jsonl-ckpt-$mode").toString
      val q = Tables.jsonLinesRobustStream(spark, src.toString, schema, mode = mode)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(sinkTable)
        .start()
      q.awaitTermination()
    }

    drain("PERMISSIVE", "jsonl_permissive")
    val rows = spark.table("jsonl_permissive").collect()
    val good = rows.filter(_.isNullAt(2))
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "alpha"), (3L, "gamma")))
    // the bad line survives VERBATIM per micro-batch — quarantine-routable
    val bad = rows.filter(!_.isNullAt(2)).map(_.getString(2))
    assert(bad.toSeq === Seq("{\"id\":2,\"name\":\"beta\""))

    drain("DROPMALFORMED", "jsonl_dropped")
    val dropped = spark.table("jsonl_dropped")
      .select(col("id")).as[Long].collect().toSet
    assert(dropped === Set(1L, 3L))

    // FAILFAST: the malformed line fails the QUERY (visible exception,
    // not a silent stall) — parity with the batch path's throw
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain("FAILFAST", "jsonl_failfast")
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("").toLowerCase).toSeq
    assert(msgs(e).exists(m => m.contains("malformed") || m.contains("failfast")),
      s"expected a malformed-record failure, got: ${msgs(e).mkString(" | ")}")
  }
  test("score-on-arrival PQ retrieval: each microbatch's shortlist equals the batch ADC path") {
    import org.apache.spark.sql.functions.{broadcast, col}
    implicit val sqlCtx = spark.sqlContext
    val e = graft.sources.Tables.embeddings(spark, Sf001)
    val (codes, cb) = graft.ops.Similarity.buildPqIndex(
      e, "vec_id", "embedding", m = 8, codebookSize = 16,
      fitFraction = 0.5, fitIters = 10)
    val cached = codes.cache()
    try {
      cached.count()
      val qvecs = e.filter(col("vec_id") < 10)
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      val stream = MemoryStream[(Long, Array[Float])]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-sret").toString
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Int, Long, Double)]()
      val q = graft.streaming.StreamRetrieval.shortlistOnArrival(
        stream.toDF().toDF("qid", "qv"), "qid", "qv",
        cached, cb, m = 8, codebookSize = 16, rerank = 8, checkpoint = ckpt) {
        (shortlist, batchId) =>
          shortlist.select("query_id", "rank", "neighbor_id", "cosine")
            .as[(Long, Int, Long, Double)].collect()
            .foreach { case (a, b, c, d) => got.add((batchId, a, b, c, d)) }
      }
      try {
        stream.addData(qvecs.take(5))
        q.processAllAvailable()
        stream.addData(qvecs.drop(5))
        q.processAllAvailable()
      } finally q.stop()
      // batch reference: the IDENTICAL expression path over all 10 queries
      val qt = e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"),
        graft.functions.exprs.pq_table_q(
          graft.functions.exprs.quant_norm20(col("embedding")), cb, 8, 16).as("qt"))
      val want = graft.ops.Similarity.topKPerQuery(
          cached.crossJoin(broadcast(qt))
            .filter(col("query_id") =!= col("neighbor_id"))
            .select(col("query_id"), col("neighbor_id"),
              graft.functions.exprs.pq_adc_score_q(col("codes"), col("qt"), 16)
                .cast("double").as("cosine")), 8)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
      val streamed = got.toArray(Array.empty[(Long, Long, Int, Long, Double)])
      assert(streamed.length === want.size, "every query answered exactly once")
      assert(streamed.map(r => (r._2, r._3, r._4, r._5)).toSet === want,
        "microbatch shortlists must equal the batch ADC path")
      // arrival semantics: batch 0 answered queries 0-4, batch 1 the rest
      assert(streamed.filter(_._1 == 0L).map(_._2).toSet === (0L until 5L).toSet)
      assert(streamed.filter(_._1 == 1L).map(_._2).toSet === (5L until 10L).toSet)
    } finally cached.unpersist()
  }
}
