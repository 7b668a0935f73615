package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): rows not dominated under
  * minimize-both — r is dominated iff some q has q.x ≤ r.x ∧ q.y ≤ r.y
  * with at least one strict. The classic formulation is a quadratic
  * NOT EXISTS self-join (the oracle runs exactly that); sorted by x,
  * it collapses to prefix-minima of y.
  *
  * Scale shape: NO global-order window (that is one task at 100 TB).
  * x is bucketed into fixed-width bins; every bin computes its local
  * prefix minima with parallel partitioned windows, and cross-bin
  * domination flows through a TINY per-bin aggregate (one row per bin)
  * whose prefix-min is broadcast-joined back — the same two-level
  * decomposition as the global sequence packer
  * (Chunking.packByBudgetGlobal).
  */
object Skyline {

  /** Keep the non-dominated rows of `df` under (xCol min, yCol min).
    * `xCol` must be integral and non-negative; `binWidth` trades bin
    * count (driver-side tiny frame) against per-bin parallelism.
    * Duplicate (x, y) points dominate nobody and all survive —
    * matching the strict-inequality SQL definition.
    */
  def pareto2d(df: DataFrame, xCol: String, yCol: String, binWidth: Long): DataFrame = {
    val binned = df.withColumn("__bin", expr(s"$xCol div $binWidth"))
    val binMin = binned.groupBy(col("__bin")).agg(min(col(yCol)).as("__bin_min"))
    // strict-prefix min over EARLIER bins: a window over one-row-per-bin
    // data — global order over a frame thousands of times smaller than
    // the input, never over the rows themselves
    val wBins = Window.orderBy(col("__bin")).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = binMin
      .withColumn("__prev_min", min(col("__bin_min")).over(wBins))
      .select(col("__bin"), col("__prev_min"))
    // in-bin prefix minima, value-based RANGE frames so x-ties see each
    // other: strict (< x) and inclusive (≤ x) variants decide the two
    // halves of the domination predicate
    val wStrict = Window.partitionBy(col("__bin")).orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wIncl = Window.partitionBy(col("__bin")).orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .join(broadcast(prefix), Seq("__bin"), "left")
      .withColumn("__m_strict",
        least(min(col(yCol)).over(wStrict), col("__prev_min")))
      .withColumn("__m_incl", min(col(yCol)).over(wIncl))
      // dominated ⟺ (∃ x'<x with y'≤y) ∨ (∃ x'≤x with y'<y)
      //           ⟺ __m_strict ≤ y ∨ __m_incl < y
      .filter((col("__m_strict").isNull || col("__m_strict") > col(yCol)) &&
        col("__m_incl") >= col(yCol))
      .drop("__bin", "__prev_min", "__m_strict", "__m_incl")
  }
}
