package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API (which in Spark 4.x wraps a
  * `ColumnNode`, not a catalyst `Expression`) and custom catalyst
  * expressions. Lives under `org.apache.spark.sql` to reach the
  * `private[sql]` conversion helpers — the standard technique for
  * libraries shipping native expressions.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
