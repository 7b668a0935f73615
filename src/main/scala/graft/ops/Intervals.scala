package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over VARIABLE-LENGTH intervals: merge each key's
  * overlapping [start, end) intervals into maximal islands.
  *
  * This is the classic warehouse "islands" problem (validity windows,
  * sensor on-periods, meeting-room occupancy). It is strictly more
  * general than gap-based sessionization (`q_sessionize`): a long
  * interval can span PAST several short ones that start later, so the
  * island boundary test must compare each start against the RUNNING MAX
  * of all previous ends — a `lag(end)` formulation is wrong whenever
  * intervals nest.
  *
  * Scale shape: one shuffle on `keyCol` (the window partition), then a
  * single ordered pass per key — no self-join, no interval×interval
  * blowup. At 100 TB the per-key ordering is the same sort any
  * sessionization needs; keys are independent so AQE/skew handling
  * applies as usual. All arithmetic is integer (caller supplies long
  * start/end), so results are bit-identical across engines and
  * partitionings.
  *
  * Reference analog: the CO2 pipeline's per-country period handling
  * (project-co2.py:101) generalized to the interval domain.
  */
object Intervals {

  /** Merge overlapping intervals per key.
    *
    * @param df       input frame
    * @param keyCol   partition key column name
    * @param startCol long interval start (inclusive)
    * @param endCol   long interval end (exclusive)
    * @param tiebreak extra ordering column making the per-key order
    *                 total (repo convention: every ordering carries a
    *                 unique tiebreak)
    * @return one row per (key, island): island index (1-based, in
    *         start order), island_start, island_end, n_intervals
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc, tiebreak.asc)
    // Running max of END over all PRECEDING intervals: a new island
    // opens exactly when this start clears everything seen so far.
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__opens",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("__opens"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }
}
