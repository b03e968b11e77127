package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4's Column wraps a ColumnNode, and the
  * Expression↔Column converters are `private[sql]` — the usual pattern
  * for extension libraries is a shim inside the `org.apache.spark.sql`
  * package tree (cf. third-party connectors and spark-extension
  * projects). */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
