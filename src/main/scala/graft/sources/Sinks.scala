package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path layouts. At 100 TB the dominant read optimization is not
  * in the query at all — it is how the data was WRITTEN: directory
  * partitioning turns time/tenant filters into file-listing pruning
  * (zero bytes read for excluded partitions), bucketing
  * ([[Bucketing]]) turns repeat joins into exchange-free scans.
  */
object Sinks {

  /** Hive-style directory partitioning: one directory per distinct
    * value of `partitionCols`. Readers filtering on those columns prune
    * whole directories at planning time (`PartitionFilters` in the scan
    * node, asserted in SinksSpec).
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Small-file compaction for a hive-partitioned layout.
    *
    * Streaming/incremental writers fragment partitions into thousands
    * of tiny files; at 100 TB the scan then pays per-file open/footer
    * cost and the driver pays listing cost. The naive fix —
    * `repartition(partitionCols)` so each directory is one write task —
    * re-introduces skew: a hot partition becomes one giant task AND one
    * giant file.
    *
    * This compactor sizes each directory independently in one
    * distributed pass: a per-partition row count (tiny, broadcast back)
    * fixes `nFiles = ceil(rows / targetRowsPerFile)` per directory, a
    * deterministic row hash spreads the directory's rows over that many
    * shuffle groups, and one `repartition(partitionCols :+ group)` +
    * `partitionBy` write lands `≤ nFiles` files per directory (hash
    * collisions can only merge groups, never split them). No driver
    * loop over partitions, no per-partition job — two jobs total at any
    * partition count.
    *
    * `targetRowsPerFile` is the knob because row width is caller-known;
    * byte-based sizing is `targetBytes / avgRowBytes` at the call site.
    */
  /** Z-order-clustered write over two numeric columns (see
    * [[graft.functions.ZOrderKernels]] for why ranks + bit interleave).
    *
    * One GK-sketch pass fits both columns' quantile boundaries
    * (`approxQuantile` — sample-free, mergeable, scale-safe), then a
    * single `repartitionByRange` + in-partition sort on the codegen'd
    * Morton key lands `nFiles` files whose footer min/max are tight
    * hyper-rectangles on BOTH columns. ZOrderSpec measures the effect
    * directly: per-file bounds intersecting a 1-d slice drop from all
    * files (linear layout) to ~sqrt (curve layout).
    *
    * `bins = 1024` → 10-bit ranks, 20-bit keys: finer than any
    * realistic file count, coarse enough that the boundary arrays
    * broadcast in the task binaries for free.
    */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int, bins: Int = 1024): Unit = {
    import graft.functions.zorder._
    require(nFiles > 0 && bins > 1 && bins <= (1 << 20))
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    val qs = df.stat.approxQuantile(Array(colA, colB), probs, 0.001)
    val zKey = interleave_bits(
      quantile_bin(col(colA).cast("double"), qs(0)),
      quantile_bin(col(colB).cast("double"), qs(1)))
    df.withColumn("__z", zKey)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  def compactPartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0)
    val parts: Seq[Column] = partitionCols.map(col)
    val nFiles = df.alias("__cd").groupBy(parts: _*)
      .agg(ceil(count(lit(1)) / targetRowsPerFile.toDouble).cast("long").as("__nfiles"))
      .alias("__cn")
    val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
    // null-SAFE join: partition values can legitimately be NULL (the
    // default-partition case) — an equi join would silently DROP those
    // rows from the compacted copy
    val joinCond = partitionCols
      .map(k => col(s"__cd.$k") <=> col(s"__cn.$k")).reduce(_ && _)
    df.alias("__cd").join(broadcast(nFiles), joinCond)
      .select(df.columns.map(c => col(s"__cd.$c")) :+ col("__cn.__nfiles"): _*)
      .withColumn("__grp", pmod(xxhash64(dataCols: _*), greatest(col("__nfiles"), lit(1L))))
      .repartition((parts :+ col("__grp")): _*)
      .drop("__nfiles", "__grp")
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
