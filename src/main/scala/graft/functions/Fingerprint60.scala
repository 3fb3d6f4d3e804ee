package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd positional rolling fingerprint over the ORDERED token
  * array: fp = Σᵢ ((h60(tokᵢ) mod P)·(i+1)) mod P, all mod P = 1e9+7 —
  * bit-identical to the posexplode + sum-aggregate pipeline and the
  * DuckDB oracle, in one compiled per-row pass (no shuffle).
  */
case class Fingerprint60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint60 =
    copy(child = newChild)
}

object Fingerprint60 {

  val P = 1000000007L

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val d = md5.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        d.reset()
        val dig = d.digest(toks.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        acc = (acc + ((h >>> 4) % P) * (i + 1) % P) % P
      }
      i += 1
    }
    acc
  }

  def fingerprint(toks: Column): Column =
    ColumnBridge.toColumn(Fingerprint60(ColumnBridge.toExpression(toks)))
}
