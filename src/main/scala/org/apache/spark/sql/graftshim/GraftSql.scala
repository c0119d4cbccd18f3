package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for `private[sql]` Column↔Expression conversion (the same
  * pattern Delta/Iceberg runtimes use to expose native expressions as
  * Columns in Spark 4, where `new Column(expr)` is no longer public).
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
