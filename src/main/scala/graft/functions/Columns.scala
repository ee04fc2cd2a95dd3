package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.GraftBridge

/** Bridge between Catalyst `Expression`s and the public `Column` API. */
object Columns {
  def of(e: Expression): Column = GraftBridge.column(e)
  def expr(c: Column): Expression = GraftBridge.expression(c)
}
