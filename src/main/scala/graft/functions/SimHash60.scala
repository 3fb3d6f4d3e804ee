package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd per-row 60-bit SimHash over a token array — one compiled
  * pass instead of the explode → 60-aggregate shuffle (batch) or a
  * 60-lambda interpreted HOF pipeline (per-row).
  *
  * Arithmetic is bit-identical to `graft.dedup.Dedup.simhash` and the
  * DuckDB oracle: per distinct token, h = first 15 md5 hex digits as a
  * 60-bit value (== the first 8 digest bytes big-endian >>> 4); bit j
  * of the signature is set iff Σ_tokens (±1 by bit j of h) > 0.
  * Callers pass the DISTINCT token array (`array_distinct(tokens)`) —
  * the set-based signature the whole simhash family uses.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](60)
    val d = md5.get()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        d.reset()
        val dig = d.digest(toks.getUTF8String(i).getBytes)
        // first 15 hex digits = first 8 bytes big-endian >>> 4
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        h = h >>> 4
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** Column-API entry point; `toks` must be `array<string>` of the
    * DISTINCT tokens.
    */
  def simhash(toks: Column): Column =
    ColumnBridge.toColumn(SimHash60(ColumnBridge.toExpression(toks)))
}
