package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-row top-k TF-IDF kernel (G11) — token array →
  * `array<struct<token, tf, s>>` of the k highest-scoring tokens under
  * a FROZEN (token → df, N) artifact held as a reference object (the
  * PqKernels idiom).
  *
  * The declarative in-row form (`transform(array_distinct(toks), t →
  * size(filter(toks, x → x = t)) …)`) is O(L·D) string comparisons per
  * document and runs INTERPRETED (HigherOrderFunction has no codegen)
  * — measured 7.1 s on the sf0.1 bench. This kernel is one hash-count
  * pass plus a D-entry sort behind a one-line codegen call: O(L + D
  * log D), stays inside whole-stage codegen, ~10× on the same bench.
  *
  * Arithmetic contracts (identical to the declarative form, hence to
  * the DuckDB oracle): score = tf · ln((N+1)/(df+1)) in double via the
  * same JVM `Math.log` Catalyst's `log()` calls; ordering by
  * round(s, 6) DESC (BigDecimal HALF_UP — Catalyst's `round`) then
  * token in BINARY order (UTF8String.compareTo — Spark's and DuckDB's
  * default string collation); OOV tokens read df = 0, the add-one idf
  * ceiling.
  */
case class KeywordTopK(child: Expression, dfTable: Seq[(String, Long)],
                       nDocs: Long, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("s", DoubleType, nullable = false))), containsNull = false)

  @transient private lazy val dfMap: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](dfTable.size * 2)
    dfTable.foreach { case (t, d) => m.put(UTF8String.fromString(t), d) }
    m
  }

  private val lnNum = (nDocs + 1).toDouble

  def topk(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]](Math.max(16, n))
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val c = counts.get(t)
        if (c == null) counts.put(t, Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    val d = counts.size()
    val entries = new Array[(UTF8String, Long, Double, Double)](d)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val tf = e.getValue()(0)
      val dfv = dfMap.get(e.getKey)
      val df = if (dfv == null) 0L else dfv.longValue()
      val s = tf.toDouble * Math.log(lnNum / (df + 1).toDouble)
      entries(j) = (e.getKey, tf, s, PqArith.round6(s))
      j += 1
    }
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Long, Double, Double)] {
      override def compare(a: (UTF8String, Long, Double, Double),
                           b: (UTF8String, Long, Double, Double)): Int = {
        val c = java.lang.Double.compare(b._4, a._4) // rounded score DESC
        if (c != 0) c else a._1.compareTo(b._1)      // token binary ASC
      }
    })
    val take = Math.min(k, d)
    val out = new Array[Any](take)
    i = 0
    while (i < take) {
      val e = entries(i)
      // clone: the key UTF8String may point into the input row buffer
      out(i) = new GenericInternalRow(Array[Any](e._1.clone(), e._2, e._3))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    topk(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kwTopK", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.topk($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): KeywordTopK =
    copy(child = newChild)
}

object KeywordTopK {
  def topk(toks: Column, dfTable: Seq[(String, Long)], nDocs: Long,
           k: Int): Column =
    ColumnBridge.toColumn(
      KeywordTopK(ColumnBridge.toExpression(toks), dfTable, nDocs, k))
}
