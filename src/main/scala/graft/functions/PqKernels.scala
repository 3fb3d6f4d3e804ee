package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Compiled product-quantization kernels (F25c).
  *
  * The naive Column formulation — `greatest()` over m×kc scored
  * structs, each with an inline codeword literal — generates ~256
  * unrolled dot-product loops per projection and blows Janino's method
  * size limit, dropping the whole stage to interpreted eval. These
  * expressions keep the codebook as a REFERENCE OBJECT (one field in
  * the generated class, the `ctx.addReferenceObj` idiom) and run the
  * argmin / table build as tight JVM loops behind a one-line codegen
  * call, so the encode projection stays inside whole-stage codegen at
  * any (m, kc).
  *
  * Arithmetic contracts (identical to the Column formulation they
  * replace, hence to the DuckDB oracle):
  *  - sub-dots accumulate float→double products in array order (the
  *    FloatDot contract);
  *  - round-to-grid is BigDecimal HALF_UP — bit-identical to Catalyst's
  *    `round()` on doubles, which the 95-query oracle surface already
  *    pins against DuckDB's `round()`.
  */
private[graft] object PqArith {
  def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** round(v·1e6, 0) then cast long — the fixed-point grid. */
  def gridLong(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  def selfDot(cw: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < cw.length) { s += cw(i).toDouble * cw(i).toDouble; i += 1 }
    s
  }
}

/** `array<float>` (full embedding) → `array<byte>` of m PQ codes:
  * per subspace the L2-nearest codeword via argmin round(c·c − 2·x·c, 6)
  * with lowest-j tie-break (strict `<` keeps the first minimum).
  */
case class PqEncodeExpr(child: Expression, book: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  private val m = book.length
  private val subDim = book(0)(0).length
  @transient private lazy val cc: Array[Array[Double]] =
    book.map(_.map(PqArith.selfDot))

  def encode(arr: ArrayData): ArrayData = {
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val row = book(s)
      var bestJ = 0
      var bestScore = Double.PositiveInfinity
      var j = 0
      while (j < row.length) {
        val cw = row(j)
        var xc = 0.0
        var i = 0
        while (i < subDim) {
          xc += arr.getFloat(base + i).toDouble * cw(i).toDouble; i += 1
        }
        val sc = PqArith.round6(cc(s)(j) - 2.0 * xc)
        if (sc < bestScore) { bestScore = sc; bestJ = j }
        j += 1
      }
      out(s) = bestJ.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `array<float>` (query embedding) → `array<array<long>>` ADC lookup
  * table: tab[s][j] = round(dot(q_s, cw_{s,j})·1e6, 0) as long — every
  * entry on the 1e-6 fixed-point grid so downstream m-term sums are
  * integer-exact and accumulation-order-independent in any engine.
  */
case class PqAdcTabExpr(child: Expression, book: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  private val m = book.length
  private val subDim = book(0)(0).length

  def tab(arr: ArrayData): ArrayData = {
    val rows = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val row = book(s)
      val out = new Array[Long](row.length)
      var j = 0
      while (j < row.length) {
        val cw = row(j)
        var xc = 0.0
        var i = 0
        while (i < subDim) {
          xc += arr.getFloat(base + i).toDouble * cw(i).toDouble; i += 1
        }
        out(j) = PqArith.gridLong(xc)
        j += 1
      }
      rows(s) = new GenericArrayData(out)
      s += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(a: Any): Any =
    tab(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTab", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.tab($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTabExpr =
    copy(child = newChild)
}

object PqKernels {
  def encode(e: Column, book: Array[Array[Array[Float]]]): Column =
    ColumnBridge.toColumn(PqEncodeExpr(ColumnBridge.toExpression(e), book))

  def adcTab(e: Column, book: Array[Array[Array[Float]]]): Column =
    ColumnBridge.toColumn(PqAdcTabExpr(ColumnBridge.toExpression(e), book))
}
