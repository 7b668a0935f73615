package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi + range join (point-in-interval) via time binning.
  *
  * Spark has no native range-join operator: `a.join(b, pt >= lo && pt
  * <= hi)` plans as BroadcastNestedLoopJoin — an O(|points|·|intervals|)
  * scan per executor that is exactly the plan you cannot run at 100 TB.
  * The scalable composition quantizes the range axis into fixed-width
  * bins: every point computes its single bin, every interval explodes to
  * the bins it covers (span/binWidth rows), and the join becomes a plain
  * EQUI join on (keys…, bin) + an exact BETWEEN verify — hash join,
  * shuffle bounded by rows × avg-bins-per-interval, no quadratic pair
  * space. This is the standard bucketed range-join scheme (the layout
  * behind range-join hints in SQL engines).
  *
  * A (point, interval) pair can match in only ONE bin (the point's), so
  * the output needs no dedup. `binWidth` trades explode factor against
  * join selectivity: ~the typical interval span is right.
  */
object RangeJoin {

  /** @param points    left side; `pointTime` is a LONG axis column (e.g.
    *                   epoch millis — floor-binned, so negatives are fine)
    * @param intervals right side with `lo`/`hi` LONG bounds (inclusive);
    *                   its other columns must not collide with the point side
    * @param keys      equi-key columns present on both sides
    */
  def pointInInterval(
      points: DataFrame, pointTime: String,
      intervals: DataFrame, lo: String, hi: String,
      keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointTime) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    p.join(iv, keys :+ "__bin")
      .filter(col(pointTime) >= col(lo) && col(pointTime) <= col(hi))
      .drop("__bin")
  }
}
