package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FloatDot

/** Session extension registering graft's custom catalyst expressions as
  * SQL functions. Enable with
  * `spark.sql.extensions=graft.GraftExtensions`, after which
  * `SELECT float_dot(a, b)` works from plain SQL alongside the Column
  * API (`FloatDot.dot`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children.head, children(1))))

  /** Register into an already-running session (tests, spark-shell). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.FunctionRegistration.register(spark, ident, info, builder)
    }
}
