package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ClassicConversions, ColumnConversions, ColumnNodeToExpressionConverter}

/** Spark 4 split `Column` (sql-api) from catalyst `Expression`; the
  * conversion traits that bridge them are `private[sql]`, so this
  * bridge lives in an `org.apache.spark.sql` subpackage — the standard
  * pattern for libraries registering custom catalyst expressions.
  */
object ColumnBridge extends ClassicConversions with ColumnConversions {
  override def converter: ColumnNodeToExpressionConverter = ColumnNodeToExpressionConverter

  def toColumn(e: Expression): Column = ColumnConstructorExt(Column).apply(e)
  def toExpression(c: Column): Expression = expression(c)
}
