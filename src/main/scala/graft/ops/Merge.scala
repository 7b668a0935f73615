package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) semantics over plain frames.
  *
  * The lakehouse `MERGE INTO` statement, expressed as its execution
  * plan: one full-outer join on the key, update side preferred where
  * present. This is the batch complement to the streaming
  * [[graft.streaming]] keyed upsert sink — same latest-wins contract,
  * one-shot over a full snapshot.
  *
  * Shape at scale: ONE shuffle of each side on the merge key (AQE
  * handles skew), no driver involvement; a real table format would add
  * file pruning on top, the join itself is exactly this. A presence
  * flag — not `coalesce` — decides the winner, so an update that
  * legitimately sets a column to NULL still wins (coalesce would
  * silently resurrect the stale base value).
  */
object Merge {

  /** @param base    current snapshot
    * @param updates changed + new rows, same schema as `base`
    * @param keys    merge key columns (unique per row on each side)
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs key columns")
    require(base.columns.sameElements(updates.columns),
      s"schemas must match: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val dataCols = base.columns.filterNot(keys.contains)
    // qualified aliases, so base and updates may derive from the SAME
    // frame (the common incremental-snapshot case) without self-join
    // attribute ambiguity
    val b = base.alias("__mb")
    val u = updates.withColumn("__upd", lit(1)).alias("__mu")
    val cond = keys.map(k => col(s"__mb.$k") <=> col(s"__mu.$k")).reduce(_ && _)
    b.join(u, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"__mu.$k"), col(s"__mb.$k")).as(k)) ++
          dataCols.map(c =>
            when(col("__mu.__upd").isNotNull, col(s"__mu.$c"))
              .otherwise(col(s"__mb.$c")).as(c)): _*)
  }
}
