package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

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
}
