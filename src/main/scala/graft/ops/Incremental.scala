package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view-style) aggregate maintenance.
  *
  * A nightly 100 TB recompute of `groupBy(keys).agg(count, sums…)` is
  * wasted work when only a delta arrived: count and sum are abelian, so
  * `agg(base ∪ delta) = agg(base) ⊕ agg(delta)` — maintain the small
  * aggregated STATE and fold each delta into it. Cost per refresh:
  * one pass over the delta + a groupwise merge with the state
  * (both map-side partial), never a base re-scan. IncrementalSpec
  * proves exact equality with the full recompute.
  *
  * Only sums/counts (and anything expressible as them — mean, M2
  * moments) maintain this way; min/max survive inserts but not deletes;
  * retractions would need a count per (key, value) — out of scope here.
  */
object Incremental {

  /** Aggregate a raw batch into `(keys…, n, <sumCols summed>)` state. */
  def aggState(batch: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(c)): _*)

  /** Fold a delta batch into maintained state: union of the two
    * aggregates, re-summed. `state` must have `aggState` shape.
    */
  def refresh(state: DataFrame, delta: DataFrame,
      keys: Seq[String], sumCols: Seq[String]): DataFrame =
    state.unionByName(aggState(delta, keys, sumCols))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
}
