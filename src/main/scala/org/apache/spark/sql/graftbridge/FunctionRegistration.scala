package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Registry access for sessions that already exist (test/REPL
  * convenience — production paths use `GraftExtensions` through
  * `spark.sql.extensions`). Lives here because `sessionState` is
  * `private[sql]`.
  */
object FunctionRegistration {
  def register(spark: SparkSession, ident: FunctionIdentifier, info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
