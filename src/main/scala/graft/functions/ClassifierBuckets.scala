package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-document feature-bucket COUNT vector: counts[b] = how many
  * tokens hash to bucket b under the classifier's h60-mod-Dim rule —
  * one compiled md5 pass over the token array (the same per-token hash
  * [[ClassifierZ]] computes). Training uses this to hash each document
  * ONCE instead of once per GD iteration: both the linear term and the
  * gradient are functions of the count vector alone —
  *
  *   z   = bias + Σ_b counts[b]·⌊(w[b]/n)·1e12⌉            (n = Σ counts)
  *   g_b = Σ_docs counts[b]·⌊(err/n)·1e9⌉
  *
  * because every occurrence of a bucket-b token contributes the SAME
  * rounded fixed-point long, so the per-occurrence sum is exactly the
  * count-weighted one (the cmsRegistersBatch count-sum identity applied
  * to GD). Spec-pinned bit-identical to the per-token fold.
  */
case class ClassifierBuckets(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ClassifierBuckets.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ClassifierBuckets.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): ClassifierBuckets =
    copy(child = newChild)
}

object ClassifierBuckets {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, dim: Int): ArrayData = {
    val n = toks.numElements()
    val counts = new Array[Long](dim)
    val d = md5.get()
    var i = 0
    while (i < n) {
      // tokens() never emits nulls (the ClassifierZ contract): a null
      // element contributes nothing
      if (!toks.isNullAt(i)) {
        d.reset()
        val dig = d.digest(toks.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        counts(((h >>> 4) % dim).toInt) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** The bucket-count vector over a token-array column. */
  def counts(toks: Column, dim: Int): Column =
    ColumnBridge.toColumn(ClassifierBuckets(ColumnBridge.toExpression(toks), dim))
}
