package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSession.sessionState` is `private[sql]`; this bridge (compiled
  * into the org.apache.spark.sql package, the standard extension-point
  * pattern) exposes exactly one capability to graft: registering a
  * Catalyst function builder on an EXISTING session, so graft's
  * functions also resolve on sessions that were not built with
  * `spark.sql.extensions=graft.GraftExtensions`. No other internals
  * leak through.
  */
object GraftRegistryBridge {
  def register(spark: SparkSession, id: FunctionIdentifier, info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
