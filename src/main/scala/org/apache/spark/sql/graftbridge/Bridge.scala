package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (the Column API is connect-agnostic); extension
  * libraries that ship custom Catalyst expressions use a bridge
  * object inside the sql package to reach the classic converter —
  * the same pattern public Spark-extension projects use. Only the
  * two conversion calls live here; all engine logic stays in graft. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
