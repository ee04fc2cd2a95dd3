package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Lives under `org.apache.spark.sql` to reach the `private[sql]`
  * Column ⇄ Expression converters (Spark 4 wraps columns in
  * `ColumnNode`s; this is the one sanctioned hop between the public
  * Column API and Catalyst expressions for library extensions).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
