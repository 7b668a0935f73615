package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus shaping for training pipelines: fixed-window chunking,
  * PII redaction, deterministic content-hash split assignment.
  *
  * All three are per-row scalar/generator transforms — no shuffle, fully
  * pipelined with the scan (the split assignment in particular MUST be a
  * pure content hash: a `rand()` split is neither reproducible across
  * runs nor stable when the corpus is re-partitioned).
  */
object Chunking {

  /** Explode each document into fixed-size character windows with
    * `overlap` characters of context carried between consecutive chunks
    * (the char-level analog of token-window packing). One generator per
    * row: starts are 1, 1+step, … while start ≤ max(len − overlap, 1),
    * step = size − overlap.
    */
  def chunkFixed(
      docs: DataFrame, textCol: String, idCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0)
    val step = size - overlap
    docs
      .select(col(idCol), col(textCol).as("__text"))
      .withColumn("start",
        explode(sequence(lit(1),
          greatest(length(col("__text")) - overlap, lit(1)), lit(step))))
      .select(col(idCol), col("start").cast("long").as("start"),
        substring(col("__text"), col("start"), lit(size)).as("chunk"))
  }

  /** ASCII-explicit patterns so Java regex and RE2-style engines agree. */
  val EmailPattern = "[A-Za-z0-9_.]+@[A-Za-z0-9.]+"
  val LongNumberPattern = "[0-9]{6,}"

  /** Redact emails then long digit runs (order matters: the email rule
    * consumes digits inside addresses first — keep both engines on the
    * same order).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def longNumberCount(text: Column): Column =
    size(regexp_extract_all(text, lit(LongNumberPattern), lit(0)))

  /** Cumulative-budget sequence packing: assign each chunk (in
    * deterministic `orderCols` order within its shard) to a pack by its
    * RUNNING token total — `pack_id = floor(tokens_before / budget)`.
    *
    * This is the window-expressible packing policy: one shuffle on the
    * shard key, no sequential driver loop, reproducible under any
    * partitioning (true greedy first-fit resets its remainder at each
    * pack close — an inherently sequential fold; cumulative packing
    * overpacks a pack by at most one chunk, which token-level truncation
    * absorbs, and in exchange parallelizes perfectly). Shard = the unit
    * a trainer reads (source/file here), so packs never span shards.
    */
  def packByBudget(
      chunks: DataFrame, shardCol: String, orderCols: Seq[String],
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)) / budget).cast("long"))
      .drop("__cum")
  }

  /** GLOBAL cumulative-budget packing: ONE total order across the whole
    * dataset (packs may span shards) without ever forming a
    * single-partition window over the data.
    *
    * `coarseBucket` must be MONOTONE in the global `orderCols` order —
    * every row of bucket b precedes every row of bucket b+1 (e.g.
    * `floor(doc_id / K)` when ordering by (doc_id, start)). Then the
    * global running sum decomposes exactly: phase 1 computes per-bucket
    * running sums with an ordinary partitioned window (parallel across
    * buckets); phase 2 prefix-sums the per-bucket GRAND TOTALS — a
    * window over the tiny bucket-totals frame (one row per bucket, the
    * only single-partition step, O(#buckets) not O(rows)) — and
    * broadcast-joins each bucket's offset back. offset + local running
    * sum == global running sum, exactly, so `pack_id` is identical to
    * what a (non-scalable) global window would produce.
    */
  def packByBudgetGlobal(
      chunks: DataFrame, coarseBucket: Column, orderCols: Seq[String],
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    import org.apache.spark.sql.expressions.Window
    val withBk = chunks.withColumn("__bk", coarseBucket)
    val wLocal = Window.partitionBy(col("__bk"))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // single-partition BY DESIGN, and safe only because it runs over the
    // bucket-totals frame: one row per bucket. The caller's coarseBucket
    // must therefore have a bounded bucket COUNT (use
    // [[monotoneIdBuckets]], which fixes it at ~4×parallelism regardless
    // of corpus size) — a width-based bucketing whose count grows with
    // the data would turn this into an O(rows) single-partition sort.
    // (WindowExec's No-Partition-Defined warning is expected here and
    // harmless for a bounded frame; a constant partition key does not
    // silence it — EliminateWindowPartitions strips foldable keys.)
    val wBuckets = Window.orderBy(col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withBk.groupBy(col("__bk"))
      .agg(sum(col(tokenCol)).as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(wBuckets) - col("__tot"))
      .select(col("__bk"), col("__off"))
    withBk
      .withColumn("__cum", sum(col(tokenCol)).over(wLocal))
      .join(broadcast(offsets), "__bk")
      .withColumn("pack_id",
        floor((col("__off") + col("__cum") - col(tokenCol)) / budget).cast("long"))
      .drop("__bk", "__cum", "__off")
  }

  /** A monotone coarse bucket for [[packByBudgetGlobal]] with a FIXED
    * bucket count regardless of corpus size: width = max_id/target + 1,
    * so bucket ids land in [0, target) whether the table holds 5k rows
    * or 50B. The max comes from one column-stats aggregate — at 100 TB
    * that is a parquet footer/stats read, not a data scan. (A constant
    * WIDTH instead — e.g. id/50 — makes the bucket count, and so the
    * single-partition offset window above, grow linearly with the
    * corpus.) Bucket ids shift when max_id grows, but pack_id output is
    * unaffected: any monotone bucketing yields the identical global
    * running sum.
    */
  def monotoneIdBuckets(
      docs: DataFrame, idCol: String, targetBuckets: Int): Column = {
    require(targetBuckets > 0)
    val row = docs.agg(max(col(idCol).cast("long"))).head()
    val mx = if (row.isNullAt(0)) 0L else math.max(0L, row.getLong(0))
    val width = mx / targetBuckets + 1
    floor(col(idCol) / width)
  }

  /** Deterministic train/val/test assignment from a CONTENT hash:
    * bucket = first 16 bits of md5(content) mod 100. Stable across
    * engines, runs, partitionings, and corpus growth (a doc keeps its
    * split forever) — the properties row-number or rand() splits lack.
    */
  def splitAssign(content: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = conv(substring(md5(content), 1, 4), 16, 10).cast("long") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }
}
