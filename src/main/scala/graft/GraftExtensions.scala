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
  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpression}

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children.head, children(1))),
    // portable 60-bit md5 hash — the shared Spark/DuckDB hashing
    // primitive under minhash/simhash/fingerprinting (TextFns.h60)
    (FunctionIdentifier("h60"),
      new ExpressionInfo(graft.text.TextFns.getClass.getName, "h60"),
      (children: Seq[Expression]) =>
        toExpression(graft.text.TextFns.h60(toColumn(children.head)))),
    // compiled per-row signatures over token/shingle arrays
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[graft.functions.SimHash60].getName, "simhash60"),
      (children: Seq[Expression]) => graft.functions.SimHash60(children.head)),
    (FunctionIdentifier("minhash12"),
      new ExpressionInfo(classOf[graft.functions.MinHash12].getName, "minhash12"),
      (children: Seq[Expression]) => graft.functions.MinHash12(children.head)),
    (FunctionIdentifier("fingerprint60"),
      new ExpressionInfo(classOf[graft.functions.Fingerprint60].getName, "fingerprint60"),
      (children: Seq[Expression]) => graft.functions.Fingerprint60(children.head)),
    // distinct k-shingle count; k must be an integer literal
    (FunctionIdentifier("shingle_distinct"),
      new ExpressionInfo(classOf[graft.functions.ShingleDistinct].getName, "shingle_distinct"),
      (children: Seq[Expression]) => {
        def bad() = throw new IllegalArgumentException(
          "shingle_distinct(tokens, k): k must be a positive integer literal")
        if (children.length != 2 || !children(1).foldable) bad()
        val k = children(1).eval() match {
          case i: Int => i
          case l: Long if l.isValidInt => l.toInt
          case b: Byte => b.toInt
          case s: Short => s.toInt
          case _ => bad()
        }
        if (k < 1) bad()
        graft.functions.ShingleDistinct(children.head, k)
      }),
    // cosine similarity of two float arrays on the codegen'd FloatDot
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[FloatDot].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        val a = toColumn(children.head)
        val b = toColumn(children(1))
        import org.apache.spark.sql.functions.sqrt
        toExpression(FloatDot.dot(a, b)
          / (sqrt(FloatDot.dot(a, a)) * sqrt(FloatDot.dot(b, b))))
      }))

  /** Register into an already-running session (tests, spark-shell). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.FunctionRegistration.register(spark, ident, info, builder)
    }
}
