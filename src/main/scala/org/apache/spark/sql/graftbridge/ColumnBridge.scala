package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between the public `Column` API and Catalyst `Expression`s for
 * graft's native expressions. Spark 4 split Column from Expression and the
 * conversion point (`classic.ExpressionUtils`) is `private[sql]`, so this
 * one-file shim lives under the org.apache.spark.sql namespace — the
 * standard pattern for libraries shipping custom catalyst Expressions.
 */
object ColumnBridge {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
