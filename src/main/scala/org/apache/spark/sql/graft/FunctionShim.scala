package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `sessionState` is `private[sql]`; registering a function on a LIVE
  * session (rather than at build time via SparkSessionExtensions) needs
  * this one-line bridge in the sql package tree — same pattern as
  * [[ColumnShim]]. */
object FunctionShim {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
