package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge to the `private[sql]` LogicalPlan→DataFrame constructor — the
  * companion of [[ColumnBridge]] for whole-operator extensions: a custom
  * logical node (e.g. [[graft.plans.AsOfJoinNode]]) becomes a normal
  * DataFrame that flows through analysis, optimization, and the
  * injected planner strategy like any built-in operator.
  */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
