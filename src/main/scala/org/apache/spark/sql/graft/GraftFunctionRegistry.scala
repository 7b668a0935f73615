package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.classic.ClassicConversions._

import graft.functions.GraftFunctionDefs

/** Registers the graft SQL functions on an ALREADY-BUILT session (the
  * extensions route only applies at session construction). Lives in an
  * `org.apache.spark.sql` subpackage for the `private[sql]`
  * `sessionState` access — same technique as [[ColumnBridge]].
  */
object GraftFunctionRegistry {
  def register(spark: SparkSession): Unit =
    GraftFunctionDefs.all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
