package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core analysis, generalized: for each entity, compare an
  * aggregated value at two periods, derive the delta and a "reduced?"
  * flag, then summarize (top movers, counts and sums by flag, range
  * labels per cluster).
  *
  * Reference: project-co2.py:100-105 (`change = 2014 - 2004`,
  * `isReduced = change <= 0`), :184-226 (top-k facts, filter+count,
  * sum-by-flag), :130-133 (per-cluster min-max labels).
  *
  * The reference's dataset is pre-pivoted (year columns). At 100 TB the
  * input is long-form (one row per entity-period observation), so the
  * pivot is done here with conditional aggregation — a single map-side
  * partial agg + one shuffle on the entity key; no separate pivot pass.
  *
  * Monetary doubles are summed as exact integer cents
  * (`sum(cast(round(v*100) as long))`) so results are identical under
  * any partitioning / aggregation order — floating-point sums are not
  * associative, and a 1000-executor cluster WILL reorder them.
  */
object PeriodChange {

  /** Long-form input -> one row per entity with v0, v1, change, isReduced.
    * Entities missing either period are dropped — the reference's
    * `na.drop("any")` step (project-co2.py:29).
    *
    * @param periodExpr expression yielding the period (e.g. year(date))
    * @param valueExpr  monetary/measure column, summed as exact cents
    */
  def changeBetween(
      df: DataFrame,
      entityCols: Seq[String],
      periodExpr: Column,
      valueExpr: Column,
      p0: Int,
      p1: Int): DataFrame = {
    val cents = round(valueExpr * 100).cast("long")
    val ec = entityCols.map(col)
    df.filter(periodExpr === p0 || periodExpr === p1)
      .groupBy(ec: _*)
      .agg(
        sum(when(periodExpr === p0, cents)).as("v0_cents"),
        sum(when(periodExpr === p1, cents)).as("v1_cents"))
      .filter(col("v0_cents").isNotNull && col("v1_cents").isNotNull)
      .withColumn("v0", col("v0_cents") / 100.0)
      .withColumn("v1", col("v1_cents") / 100.0)
      .withColumn("change", (col("v1_cents") - col("v0_cents")) / 100.0)
      .withColumn("is_reduced", col("v1_cents") <= col("v0_cents"))
      .drop("v0_cents", "v1_cents")
  }

  /** Top-n movers. project-co2.py:187-200. `tiebreak` makes the limit
    * deterministic (ORDER BY value alone is not a total order).
    */
  def topMovers(
      change: DataFrame, orderCol: String, descending: Boolean,
      n: Int, tiebreak: String): DataFrame = {
    val primary = if (descending) col(orderCol).desc else col(orderCol).asc
    change.orderBy(primary, col(tiebreak).asc).limit(n)
  }

  /** Counts + exact-cents sums split by the reduced flag.
    * project-co2.py:203-222. One shuffle on a 2-value key; partial aggs
    * do nearly all the work map-side.
    */
  def sumByFlag(change: DataFrame): DataFrame =
    change
      .groupBy(col("is_reduced"))
      .agg(
        count(lit(1)).as("n_entities"),
        (sum(round(col("change") * 100).cast("long")) / 100.0).as("total_change"))
      .orderBy(col("is_reduced"))

  /** Per-group "min - max" range label, as the reference's UDF
    * (project-co2.py:130-132) — but with codegen'd built-ins
    * (format_number/cast + concat) instead of an opaque UDF, so it stays
    * inside whole-stage codegen.
    *
    * `formatted = true` renders the reference's human-facing
    * `format_number(_, 3)` style ("1,234.567"); `false` renders the
    * plain cast form, which is what ANSI-SQL oracles can reproduce —
    * one code path, both label styles (q_label_agg uses plain,
    * q_kmeans_clusters the reference style).
    */
  def rangeLabels(
      df: DataFrame, groupCol: String, valueCol: String,
      formatted: Boolean = true): DataFrame = {
    def render(c: Column): Column =
      if (formatted) format_number(c, 3) else c.cast("string")
    df.groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"))
      .withColumn("label",
        concat(render(col("min_v")), lit(" - "), render(col("max_v"))))
      .orderBy(col(groupCol))
  }
}
