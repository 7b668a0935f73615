package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at scale — percentiles and median absolute
  * deviation WITHOUT per-group in-memory value collection.
  *
  * Spark's exact `percentile` aggregate materializes every group's
  * values into ONE aggregation buffer — a 33M-row group at sf10 is a
  * multi-GB object array on a single reducer, and it does not spill.
  * The selection form here sorts within each group (WindowExec's
  * ExternalSorter SPILLS to disk) and picks the two rows bracketing
  * each requested order index p·(n−1) with a post-window filter —
  * per-group memory is the sort spill budget, not the group size.
  * Values interpolate exactly like `percentile` / DuckDB
  * `quantile_cont` (identical double arithmetic, oracle-hash-proven).
  *
  * Cost: ONE shuffle + sort-window pass (group size rides the same
  * window via an unbounded-frame count — CollapseWindow fuses it).
  * Measured ~2× the built-in locally (sf0.1: 4.7 s vs 2.2 s for a
  * 3-group median over 600k rows) — WindowExec's row machinery vs the
  * specialized buffer — accepted deliberately: the built-in's buffer
  * cannot spill, so it stops working at all somewhere between sf1 and
  * sf10 per group, while this form degrades gracefully. A histogram
  * variant (count per distinct value, cumsum) was also measured: 3×
  * slower on near-unique values, where the histogram is as large as
  * the data and its extra exchange dominates.
  */
object RobustStats {

  /** Per-group exact interpolated percentiles of a numeric column.
    * Returns one row per group: (groupCol, n, <name> per requested p).
    */
  def percentilesByGroup(
      df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v").asc)
    // group size n from an unbounded frame over the SAME partition+order
    // spec: CollapseWindow fuses it into the one Window pass (no second
    // scan, no join); the unbounded count frame is spill-backed
    // nulls are dropped BEFORE ranking — the built-in `percentile`
    // ignores null inputs, and without this filter nulls would sort
    // first, shifting every order index and inflating the window count
    val ranked = df.select(col(groupCol), col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col(groupCol), col("__v"),
        (row_number().over(w) - 1).cast("double").as("__i"),
        count(lit(1)).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("n"))
    // keep only rows sitting ON a requested order index (≤ 2·|ps| per
    // group) — everything downstream is group-count sized
    val wanted = ps.map { case (_, p) =>
      val idx = lit(p) * (col("n") - 1).cast("double")
      col("__i") === floor(idx) || col("__i") === ceil(idx)
    }.reduce(_ || _)
    val aggs: Seq[Column] = ps.flatMap { case (name, p) =>
      val idx = lit(p) * (col("n") - 1).cast("double")
      Seq(
        max(when(col("__i") === floor(idx), col("__v"))).as(s"__${name}_lo"),
        max(when(col("__i") === ceil(idx), col("__v"))).as(s"__${name}_hi"))
    }
    val agged = ranked.filter(wanted)
      .groupBy(col(groupCol), col("n"))
      .agg(aggs.head, aggs.tail: _*)
    val outCols: Seq[Column] = Seq(col(groupCol), col("n")) ++
      ps.map { case (name, p) =>
        val idx = lit(p) * (col("n") - 1).cast("double")
        val frac = idx - floor(idx)
        (col(s"__${name}_lo") * (lit(1.0) - frac) +
          col(s"__${name}_hi") * frac).as(name)
      }
    agged.select(outCols: _*)
  }

  /** Per-group median + MAD + 3·MAD outlier counts, collection-free:
    * median by sort-selection, deviations joined against the broadcast
    * medians, MAD by a second sort-selection over the deviations, and
    * the outlier count from one more pass over the (checkpointed)
    * deviation frame — never a value buffer anywhere.
    */
  def madOutliersByGroup(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val med = percentilesByGroup(df, groupCol, valCol, Seq(("med", 0.5)))
      .select(col(groupCol), col("n"), col("med"))
      .localCheckpoint(eager = true)
    // the deviation frame feeds the MAD selection (twice: count + sort)
    // and the outlier count — checkpoint so the corpus scan + broadcast
    // join run once, and downstream passes read local blocks
    val devs = df
      .join(broadcast(med.select(col(groupCol), col("med"))), groupCol)
      .select(col(groupCol),
        abs(col(valCol).cast("double") - col("med")).as("__d"))
      .localCheckpoint(eager = true)
    val mad = percentilesByGroup(devs, groupCol, "__d", Seq(("mad", 0.5)))
      .select(col(groupCol), col("mad"))
    val outliers = devs.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(sum(when(col("__d") > lit(3.0) * col("mad"), 1L).otherwise(0L))
        .as("n_outliers"))
    med.join(mad, groupCol).join(outliers, groupCol)
      .select(col(groupCol), col("n"), col("n_outliers"),
        col("med"), col("mad"))
  }
}
