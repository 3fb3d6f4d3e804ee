package graft.functions

import java.math.{BigDecimal, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd classifier linear term (the F44/G16 hot path, profiled in
  * SURVEY §6): zFixed = Σ_tokens ⌊(w[h60(tok) mod Dim] / n)·1e12⌉ as
  * one compiled pass over the token array — bit-identical to the
  * declarative `aggregate` HOF fold it replaces (which is interpreted:
  * lambda expressions never enter whole-stage codegen, the F8b
  * ShingleDistinct lesson), including Spark round()'s HALF_UP-on-
  * shortest-decimal-repr semantics (BigDecimal.valueOf, exactly the
  * Round expression's double path) so the DuckDB oracle is unchanged.
  * n is the ARRAY LENGTH (what the callers pass as size(toks)); an
  * empty array folds to 0 without dividing. The model weights ride
  * into generated code as a referenced object, not a 64-literal
  * expression tree.
  */
case class ClassifierZ(child: Expression, w: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    ClassifierZ.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clsW", w, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ClassifierZ.compute($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierZ =
    copy(child = newChild)
}

object ClassifierZ {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, w: Array[Double]): Long = {
    val n = toks.numElements()
    val dim = w.length
    val d = md5.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      // tokens() never emits nulls; a null element would null the
      // declarative fold, which nullSafeEval can't express mid-array —
      // treat it as contributing nothing (and it never occurs)
      if (!toks.isNullAt(i)) {
        d.reset()
        val dig = d.digest(toks.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        val bucket = ((h >>> 4) % dim).toInt
        // Spark round(double): BigDecimal.valueOf (shortest decimal
        // repr) + HALF_UP — replicated exactly so weights fold to the
        // same fixed-point longs the oracle computes
        acc += BigDecimal.valueOf(w(bucket) / n * 1e12)
          .setScale(0, RoundingMode.HALF_UP).longValue()
      }
      i += 1
    }
    acc
  }

  /** The fixed-point linear term over a token-array column. */
  def zFixed(toks: Column, w: Array[Double]): Column =
    ColumnBridge.toColumn(ClassifierZ(ColumnBridge.toExpression(toks), w))

  /** [[compute]] over a PRE-HASHED bucket-count vector
    * ([[ClassifierBuckets]]) instead of the token array: every
    * occurrence of a bucket-b token folds the SAME rounded long, so
    * Σ_occurrences ≡ Σ_b counts[b]·⌊(w[b]/n)·1e12⌉ exactly (n = Σ
    * counts = the token-array length — tokens() never emits nulls).
    * Lets GD training hash each document once at cache build instead
    * of once per iteration; spec-pinned bit-identical to [[compute]].
    */
  def computeFromCounts(cnts: ArrayData, w: Array[Double]): Long = {
    val dim = w.length
    var n = 0L
    var i = 0
    while (i < dim) { n += cnts.getLong(i); i += 1 }
    var acc = 0L
    if (n > 0L) {
      i = 0
      while (i < dim) {
        val c = cnts.getLong(i)
        if (c != 0L)
          acc += c * BigDecimal.valueOf(w(i) / n * 1e12)
            .setScale(0, RoundingMode.HALF_UP).longValue()
        i += 1
      }
    }
    acc
  }

  /** The fixed-point linear term over a bucket-count column. */
  def zFixedCounts(cnts: Column, w: Array[Double]): Column =
    ColumnBridge.toColumn(ClassifierZCounts(ColumnBridge.toExpression(cnts), w))
}

/** [[ClassifierZ]]'s twin over the [[ClassifierBuckets]] count vector
  * (see [[ClassifierZ.computeFromCounts]]).
  */
case class ClassifierZCounts(child: Expression, w: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    ClassifierZ.computeFromCounts(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clsW", w, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ClassifierZ.computeFromCounts($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierZCounts =
    copy(child = newChild)
}
