package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd distinct k-word-shingle count over a token array — the
  * counting core of `text_repetition` (F8b) in one compiled per-row
  * pass. Value-identical to
  * `size(array_distinct(TextFns.shinglesN(toks, k)))` (shingles joined
  * with a single space, null tokens skipped exactly as `concat_ws`
  * does), but ~8× faster: the declarative form is a higher-order
  * `transform`+`slice`+`concat_ws` chain that Spark evaluates
  * INTERPRETED per element (HigherOrderFunction has no codegen), and it
  * materializes the full shingle array only to take its length.
  */
case class ShingleDistinct(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    ShingleDistinct.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleDistinct.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleDistinct =
    copy(child = newChild)
}

object ShingleDistinct {

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, k: Int): Long = {
    val n = toks.numElements()
    if (n < k) return 0L
    val seen = new java.util.HashSet[String](Math.max(16, (n - k + 1) * 2))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < k) {
        // concat_ws semantics: null elements are skipped, not rendered
        if (!toks.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.size.toLong
  }

  def distinctShingles(toks: Column, k: Int): Column =
    ColumnBridge.toColumn(ShingleDistinct(ColumnBridge.toExpression(toks), k))
}
