package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for every left row, the single latest right row of the
  * same key with `rightTime <= leftTime` — the point-in-time lookup
  * (feature stores, slowly-changing state, market data).
  *
  * Spark has no native ASOF operator; the scalable composition is the
  * union trick: tag both sides, union them, and run ONE window pass per
  * key ordered by time where `last(right-row-struct, ignoreNulls)`
  * carries the most recent right row forward into each left row. Cost:
  * a single shuffle on the key — a naive "equi-join + filter + argmax"
  * materializes every (left, earlier-right) pair first; this never
  * forms pairs at all. The right row travels as ONE struct, so its
  * columns can never mix across different right rows.
  *
  * Equal timestamps count as "at or before": right rows sort before
  * left rows on ties (`__is_right` descending in the window order),
  * matching native ASOF JOIN `l.t >= r.t` semantics (DuckDB's ASOF
  * JOIN is the oracle for q_asof_join).
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried onto each left row as
    *                   `asof_<name>` (null when no right row precedes)
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rType = StructType(valueCols.map(c => right.schema(c)))
    val taggedLeft = left
      .withColumn("__is_right", lit(false))
      .withColumn("__r", lit(null).cast(rType))
    val taggedRight = right.select(
      (Seq(col(keyCol), col(timeCol), lit(true).as("__is_right"),
        struct(valueCols.map(col): _*).as("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // The struct itself is the final tiebreak: among multiple right rows
    // with equal (key, time) the carried asof_* values are otherwise
    // whatever partition order produced — against the repo convention
    // that every ordering carries a unique tiebreak. Structs are
    // orderable in Spark; within a tie-group all __r are non-null (right
    // rows) or all null (left rows), so it never perturbs the
    // right-before-left tie rule enforced by __is_right desc. The winner
    // is the lexicographically greatest right row — deterministic.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__r_last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(!col("__is_right"))
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__r_last.$c").as(s"asof_$c")): _*)
  }

  /** FORWARD as-of join (pandas `merge_asof(direction='forward')`): for
    * every left row, the single EARLIEST right row of the same key with
    * `rightTime >= leftTime` — "next event at or after" lookups
    * (next maintenance window, next price tick, next delivery slot).
    *
    * Mirror image of [[leftAsOf]]: same tag-union-window composition,
    * same single shuffle on the key, with the window ordered by time
    * DESCENDING so `last(right-struct, ignoreNulls)` carries the
    * nearest LATER right row backward onto each left row. Equal
    * timestamps count as "at or after" (right still sorts before left
    * within a tie), and the struct-asc final tiebreak keeps the carried
    * row deterministic among equal right timestamps — the
    * lexicographically greatest right row, as in [[leftAsOf]].
    */
  def leftAsOfForward(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rType = StructType(valueCols.map(c => right.schema(c)))
    val taggedLeft = left
      .withColumn("__is_right", lit(false))
      .withColumn("__r", lit(null).cast(rType))
    val taggedRight = right.select(
      (Seq(col(keyCol), col(timeCol), lit(true).as("__is_right"),
        struct(valueCols.map(col): _*).as("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__r_last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(!col("__is_right"))
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__r_last.$c").as(s"asof_$c")): _*)
  }

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`): for
    * every left row, whichever of the latest-at-or-before / earliest-
    * at-or-after right rows is closer in time; exact ties prefer the
    * BACKWARD match (pandas semantics).
    *
    * Still ONE shuffle: both directional passes run over the same
    * tagged union in the same key partition — two Sort+Window nodes
    * share one Exchange (the second window re-sorts within partitions,
    * no data movement). The right row's own timestamp rides inside the
    * carried struct so the final projection can compare distances.
    */
  def leftAsOfNearest(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    val leftCols = left.columns.toSeq
    val rType = StructType(
      right.schema(timeCol).copy(name = "__rt") +: valueCols.map(right.schema(_)))
    val taggedLeft = left
      .withColumn("__is_right", lit(false))
      .withColumn("__r", lit(null).cast(rType))
    val taggedRight = right.select(
      (Seq(col(keyCol), col(timeCol), lit(true).as("__is_right"),
        struct(col(timeCol).as("__rt") +: valueCols.map(col): _*).as("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val wb = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def millis(c: Column): Column = left.schema(timeCol).dataType match {
      case TimestampType => unix_millis(c)
      case _ => c.cast("long")
    }
    val withBoth = taggedLeft.unionByName(taggedRight)
      .withColumn("__back", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", last(col("__r"), ignoreNulls = true).over(wf))
      .filter(!col("__is_right"))
    val dBack = millis(col(timeCol)) - millis(col("__back.__rt"))
    val dFwd = millis(col("__fwd.__rt")) - millis(col(timeCol))
    val pick = when(col("__back").isNull, col("__fwd"))
      .when(col("__fwd").isNull, col("__back"))
      .when(dFwd < dBack, col("__fwd"))
      .otherwise(col("__back")) // closer-or-tied backward wins
    withBoth.withColumn("__pick", pick)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__pick.$c").as(s"asof_$c")): _*)
  }

  /** As-of with a STALENESS BOUND (pandas `merge_asof(tolerance=…)`):
    * like [[leftAsOf]], but a carried right row older than `withinMs`
    * is treated as no match (feature stores call this TTL — a
    * year-old "latest" price is usually worse than none).
    *
    * Same single-shuffle union+window plan; the right row's own time
    * rides inside the carried struct, and the final projection nulls
    * the `asof_*` columns where the age exceeds the bound — the window
    * pass itself is unchanged, so the cost is identical to the
    * unbounded join.
    */
  def leftAsOfWithin(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      valueCols: Seq[String], withinMs: Long): DataFrame = {
    require(withinMs >= 0)
    import org.apache.spark.sql.types.TimestampType
    val leftCols = left.columns.toSeq
    val rType = StructType(
      right.schema(timeCol).copy(name = "__rt") +: valueCols.map(right.schema(_)))
    val taggedLeft = left
      .withColumn("__is_right", lit(false))
      .withColumn("__r", lit(null).cast(rType))
    val taggedRight = right.select(
      (Seq(col(keyCol), col(timeCol), lit(true).as("__is_right"),
        struct(col(timeCol).as("__rt") +: valueCols.map(col): _*).as("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLast = taggedLeft.unionByName(taggedRight)
      .withColumn("__r_last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(!col("__is_right"))
    val age = left.schema(timeCol).dataType match {
      case TimestampType =>
        unix_millis(col(timeCol)) - unix_millis(col("__r_last.__rt"))
      case _ => col(timeCol) - col("__r_last.__rt")
    }
    val fresh = col("__r_last").isNotNull && age <= withinMs
    withLast.select(leftCols.map(col) ++
      valueCols.map(c => when(fresh, col(s"__r_last.$c")).as(s"asof_$c")): _*)
  }
}
