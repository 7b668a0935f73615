package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Streaming variant: bounded state via watermark. */
  def windowedAggStreaming(
      events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), windowLength)

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
