package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Null/NaN/duplicate handling, mirroring the reference's preprocessing.
  *
  * Reference: project-co2.py:21-31 — `na.drop("all")`,
  * `na.drop("all", subset=("2004","2014"))`, `na.drop("any")`; README:10
  * claims duplicate handling.
  *
  * `dropNullOrNan` exists alongside the thin `na.drop` wrappers because
  * Spark's `na.drop` silently also drops NaN in float/double columns —
  * a semantic worth making explicit (and oracle-matchable in ANSI SQL).
  * All of these are simple `Filter` nodes: Catalyst pushes the null
  * checks into the parquet scan, so they cost nothing extra at scale.
  */
object Preprocess {

  /** Drop rows where every column is null. project-co2.py:25 */
  def dropAllNull(df: DataFrame): DataFrame = df.na.drop("all")

  /** Drop rows where every column in `subset` is null. project-co2.py:26 */
  def dropAllNull(df: DataFrame, subset: Seq[String]): DataFrame =
    df.na.drop("all", subset)

  /** Drop rows where any column is null. project-co2.py:29 */
  def dropAnyNull(df: DataFrame): DataFrame = df.na.drop("any")

  def dropAnyNull(df: DataFrame, subset: Seq[String]): DataFrame =
    df.na.drop("any", subset)

  /** Explicit-semantics variant: drop a row when any listed column is
    * null, or NaN for floating-point columns. Equivalent to
    * `na.drop("any", cols)` but spelled out as a filter so the exact
    * predicate is visible in the plan (and expressible in ANSI SQL).
    */
  def dropNullOrNan(df: DataFrame, cols: Seq[String]): DataFrame = {
    val preds: Seq[Column] = cols.map { c =>
      df.schema(c).dataType match {
        case DoubleType | FloatType => col(c).isNotNull && !isnan(col(c))
        case _                      => col(c).isNotNull
      }
    }
    df.filter(preds.reduce(_ && _))
  }

  /** README:10 — duplicate handling. Full-row or subset-keyed. For the
    * subset-keyed form the survivor is the row with the smallest tiebreak
    * value, which (unlike bare `dropDuplicates`) is deterministic under
    * any partitioning — required both for the duckdb oracle and for
    * reproducible pipelines on a real cluster.
    */
  def dropDuplicateRows(df: DataFrame): DataFrame = df.dropDuplicates()

  def dropDuplicatesKeepFirst(
      df: DataFrame, keys: Seq[String], tiebreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tiebreak).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
