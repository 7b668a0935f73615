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
  def compactPartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0)
    val parts: Seq[Column] = partitionCols.map(col)
    val nFiles = df.groupBy(parts: _*)
      .agg(ceil(count(lit(1)) / targetRowsPerFile.toDouble).cast("long").as("__nfiles"))
    val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
    df.join(broadcast(nFiles), partitionCols)
      .withColumn("__grp", pmod(xxhash64(dataCols: _*), greatest(col("__nfiles"), lit(1L))))
      .repartition((parts :+ col("__grp")): _*)
      .drop("__nfiles", "__grp")
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
