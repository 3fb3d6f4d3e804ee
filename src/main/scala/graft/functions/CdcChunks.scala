package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd byte-level content-defined chunking (CDC) over a binary
  * column — the real storage-dedup chunker (LBFS/FastCDC family) that
  * F52's token-level rule stands in for on text: chunk boundaries
  * derive from a GEAR rolling hash of the byte stream, so an insertion
  * near the start of a payload shifts every byte offset but the
  * boundary positions re-synchronize within one hash window past the
  * edit — only the edited chunk's hash changes and the shared tail
  * still dedups (the ByteCdcSpec pins exactly this at byte
  * granularity). This is what extends chunk dedup to the multimodal
  * binary payloads the G15 gate admits.
  *
  * Boundary rule (gear hash, public FastCDC construction):
  * `h = (h << 1) + GEAR(byte)`; byte position i ends a chunk iff the
  * top `maskBits` bits of h are all zero (expected chunk length
  * 2^maskBits bytes). Masking the HIGH bits makes the predicate a
  * pure function of the trailing 64 bytes — a byte 64+ positions back
  * has shifted entirely out of the register and addition carries only
  * propagate upward — and h is never reset at a cut, so the boundary
  * SET is position-independent (pure content): the strongest possible
  * resync guarantee, with no min/max-length special cases whose
  * position dependence would weaken it.
  *
  * One compiled pass per payload (the F52 lesson: never per-chunk
  * lambdas): every byte feeds the rolling hash exactly once and is
  * md5'd into exactly one chunk digest. Returns
  * `array<struct<offset, length, chunk_md5>>` — offsets for scrub /
  * reassembly, md5 as the chunk-store key.
  */
case class CdcChunks(child: Expression, maskBits: Int) extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 32,
    s"CdcChunks: maskBits must be in [1,32] (got $maskBits)")

  override def dataType: DataType = CdcChunks.OutType

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunks.compute($c, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)

  /** 256-entry gear table: first 8 md5 bytes of "graft-cdc-gear-<b>",
    * big-endian — deterministic across JVMs and sessions (the
    * MinHash12 salt discipline), so chunk boundaries are stable
    * forever without shipping a table.
    */
  private val Gear: Array[Long] = {
    val d = MessageDigest.getInstance("MD5")
    Array.tabulate(256) { b =>
      d.reset()
      val dig = d.digest(s"graft-cdc-gear-$b".getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
      h
    }
  }

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(dig: Array[Byte]): UTF8String = {
    val out = new Array[Char](dig.length * 2)
    var i = 0
    while (i < dig.length) {
      out(i * 2) = HexDigits((dig(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexDigits(dig(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Called from both interpreted eval and generated code. */
  def compute(payload: Array[Byte], maskBits: Int): ArrayData = {
    val n = payload.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = ((1L << maskBits) - 1) << (64 - maskBits)
    val d = md5.get()
    val chunks = new java.util.ArrayList[Any](Math.max(4, n >>> maskBits))
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(payload(i) & 0xff)
      if ((h & mask) == 0L) {
        d.reset()
        d.update(payload, start, i + 1 - start)
        chunks.add(new GenericInternalRow(Array[Any](
          start.toLong, (i + 1 - start).toLong, hex(d.digest()))))
        start = i + 1
      }
      i += 1
    }
    if (start < n) {
      d.reset()
      d.update(payload, start, n - start)
      chunks.add(new GenericInternalRow(Array[Any](
        start.toLong, (n - start).toLong, hex(d.digest()))))
    }
    new GenericArrayData(chunks.toArray)
  }

  /** Reference single-payload form for specs (no Spark plumbing). */
  def chunksOf(payload: Array[Byte], maskBits: Int): Seq[(Long, Long, String)] = {
    val a = compute(payload, maskBits)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
    }
  }

  /** Column-API entry point; `payload` must be `binary`. */
  def cdcChunks(payload: Column, maskBits: Int): Column =
    ColumnBridge.toColumn(CdcChunks(ColumnBridge.toExpression(payload), maskBits))
}
