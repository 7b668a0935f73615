package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions._

/** Read-only view of the session's CacheManager, for specs that assert
  * operators release what they persist (library cache hygiene). Lives in
  * an `org.apache.spark.sql` subpackage for the `private[sql]`
  * `sharedState` access — same technique as [[ColumnBridge]].
  */
object CacheBridge {
  /** True when no DataFrame/plan is registered in the cache manager. */
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
