package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the storage-level join optimization for the
  * 100 TB fact↔fact case: both sides hash-partitioned into the same
  * bucket count on the join key AT WRITE TIME, so repeated joins and
  * aggregations on that key need NO exchange at read time (the scan
  * itself reports the hash partitioning to Catalyst).
  *
  * Broadcast covers small dims; bucketing covers the big-big join you
  * run every day — pay the shuffle once when landing the data, never
  * again. BucketingSpec asserts the join plan is Exchange-free.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. Same
    * `buckets` count on both join sides is required for the exchange
    * elimination to kick in.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir
}
