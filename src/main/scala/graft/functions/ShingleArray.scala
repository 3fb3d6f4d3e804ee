package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct k-word-shingle ARRAY over a token array — the
  * shingle producer under the n-gram family (docShingles → Jaccard
  * dedup, decontamination). Value-identical to
  * `TextFns.shinglesN(toks, k)` — space-joined windows, `concat_ws`
  * null-skip, first-occurrence order preserved exactly as
  * `array_distinct` keeps it — but compiled: the declarative
  * `transform`+`slice`+`concat_ws` chain is a higher-order function
  * Spark evaluates interpreted per element.
  */
case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleArray.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet: first-occurrence order, matching array_distinct
    val seen = new java.util.LinkedHashSet[String](Math.max(16, (n - k + 1) * 2))
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
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  def shingles(toks: Column, k: Int): Column =
    ColumnBridge.toColumn(ShingleArray(ColumnBridge.toExpression(toks), k))
}
