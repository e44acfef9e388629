package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the classic-session Column <-> catalyst Expression
  * conversion, which Spark 4 made `private[sql]` during the Connect
  * refactor. Lives in a subpackage of org.apache.spark.sql solely to
  * satisfy that access modifier — nothing here but the two casts.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
