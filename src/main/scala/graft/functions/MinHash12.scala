package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd per-row MinHash signature over a shingle array — one
  * compiled pass instead of the explode → 12-min-aggregate shuffle.
  *
  * Arithmetic is bit-identical to the DuckDB oracle: per shingle,
  * hv = (first 15 md5 hex digits) mod P31; slot i holds
  * min((aᵢ·hv + bᵢ) mod P31) with the fixed `params` schedule (shared
  * single source — `Dedup.minhashParams` aliases it). Empty input
  * arrays yield an empty signature array (the explode pipeline emits
  * no row for such docs; call sites filter them identically).
  */
case class MinHash12(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHash12.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash12.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash12 =
    copy(child = newChild)
}

object MinHash12 {

  val P31 = 2147483647L

  /** Fixed, engine-portable schedule: hᵢ(x) = (aᵢ·x + bᵢ) mod P31. */
  val params: Seq[(Int, Long, Long)] =
    (0 until 12).map(i => (i, 1000003L * (i + 1) + 17L, 7919L * (i + 1) + 13L))

  private val as: Array[Long] = params.map(_._2).toArray
  private val bs: Array[Long] = params.map(_._3).toArray

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val slots = Array.fill(12)(Long.MaxValue)
    val d = md5.get()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        d.reset()
        val dig = d.digest(shingles.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        val hv = (h >>> 4) % P31
        var s = 0
        while (s < 12) {
          val v = (as(s) * hv + bs(s)) % P31
          if (v < slots(s)) slots(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(slots)
  }

  /** Column-API entry point; `shingles` must be `array<string>`. */
  def minhash(shingles: Column): Column =
    ColumnBridge.toColumn(MinHash12(ColumnBridge.toExpression(shingles)))
}
