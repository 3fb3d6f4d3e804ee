package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd float-array dot product: Σ xᵢ·yᵢ accumulated in double,
  * sequential array order (bit-identical to a fold, so the DuckDB
  * oracle's double arithmetic agrees).
  *
  * A `zip_with`+`aggregate` lambda pipeline evaluates interpreted, one
  * closure call per element; this expression compiles to a tight Java
  * loop inside whole-stage codegen — the hot path of every cosine /
  * norm computation in `graft.similarity.Ann`. Inputs must be
  * `array<float>` columns (call sites guarantee this).
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Column-API entry point; both columns must be `array<float>`. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      FloatDot(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
