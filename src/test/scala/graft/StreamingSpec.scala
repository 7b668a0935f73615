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
}
