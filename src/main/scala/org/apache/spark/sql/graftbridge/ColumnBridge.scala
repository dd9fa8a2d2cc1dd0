package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions. Spark 4
  * made the converters `private[sql]` (`classic/columnNodeSupport.scala`),
  * so third-party expressions reach them from a package under
  * `org.apache.spark.sql` — the standard extension seam.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
