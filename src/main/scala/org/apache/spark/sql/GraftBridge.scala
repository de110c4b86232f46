package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversion for
  * graft's native Catalyst expressions (Spark 4 made `new Column(expr)`
  * internal behind ColumnNode). Lives in the spark.sql package solely
  * to re-export the two conversions; no Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
