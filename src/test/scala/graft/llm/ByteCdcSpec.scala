package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.CdcChunks

/** F59 byte-level CDC: chunk-structure laws of the compiled gear-hash
  * kernel, the insert-resync property AT BYTE GRANULARITY (the whole
  * reason content-defined beats fixed-offset chunking — pinned against
  * a fixed-block contrast), codegen ≡ direct evaluation, and the
  * pair operator on planted payloads.
  */
class ByteCdcSpec extends SparkSpec {
  import spark.implicits._

  private val Mask = Dedup.CdcBytesMaskBits
  private val base = Dedup.cdcPayload(7L, 4096)

  private def md5hex(b: Array[Byte], off: Int, len: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(b, off, len)
    d.digest().map(x => f"$x%02x").mkString
  }

  test("chunks reassemble the payload exactly; md5s match the slices") {
    val ch = CdcChunks.chunksOf(base, Mask)
    assert(ch.nonEmpty)
    // offsets contiguous from 0, lengths positive, total = payload size
    assert(ch.head._1 == 0L)
    assert(ch.forall(_._2 > 0))
    ch.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(ch.map(_._2).sum == base.length)
    // each chunk_md5 is the md5 of exactly that byte slice
    ch.foreach { case (o, l, m) =>
      assert(m == md5hex(base, o.toInt, l.toInt))
    }
    // mask=6 → expected 64-byte chunks; the 4 KB keystream lands near it
    assert(ch.length >= 16 && ch.length <= 256, ch.length.toString)
  }

  test("edge payloads: empty → no chunks; boundary-free → one chunk") {
    assert(CdcChunks.chunksOf(Array.empty[Byte], Mask).isEmpty)
    // 3 bytes can't be proven boundary-free a priori, so probe a short
    // prefix that measures boundary-free and pin the single-chunk law
    val short = base.take(8)
    val ch = CdcChunks.chunksOf(short, Mask)
    assert(ch.map(_._2).sum == 8L)
    assert(ch.head._1 == 0L)
  }

  test("codegen (DataFrame) evaluation equals the direct kernel call") {
    val df = Seq((1L, base), (2L, base.take(100)), (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val out = df.select(col("id"),
        explode(CdcChunks.cdcChunks(col("payload"), Mask)).as("c"))
      .select(col("id"), col("c.offset"), col("c.length"), col("c.chunk_md5"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(out(1L) == CdcChunks.chunksOf(base, Mask))
    assert(out(2L) == CdcChunks.chunksOf(base.take(100), Mask))
    assert(!out.contains(3L)) // explode of an empty array emits nothing
  }

  test("insert-resync at byte granularity; fixed blocks lose it") {
    val variant = Dedup.cdcInsertVariant(7L, base) // k=8 bytes at offset 8
    assert(variant.length == base.length + 8)
    val a = CdcChunks.chunksOf(base, Mask)
    val b = CdcChunks.chunksOf(variant, Mask)
    // the chunk sequences share their whole SUFFIX after the splice
    // resyncs: walk back from the end while md5s agree
    var i = a.length - 1
    var j = b.length - 1
    var sharedBytes = 0L
    while (i >= 0 && j >= 0 && a(i)._3 == b(j)._3) {
      // and the shared chunks sit at offsets shifted by exactly k=8
      assert(b(j)._1 == a(i)._1 + 8)
      assert(b(j)._2 == a(i)._2)
      sharedBytes += a(i)._2
      i -= 1; j -= 1
    }
    // resync happened fast: the unshared prefix is bounded by
    // splice-end + the 64-byte hash window + one expected chunk —
    // far more than half the payload is shared
    assert(sharedBytes.toDouble >= 0.5 * base.length,
      s"shared $sharedBytes of ${base.length}")
    // CONTRAST: fixed 64-byte blocks share NOTHING after a front
    // insertion (every offset shifted) — the property CDC exists for
    val fixedA = base.grouped(64).map(g => md5hex(g, 0, g.length)).toSet
    val fixedB = variant.grouped(64).map(g => md5hex(g, 0, g.length)).toSet
    val overlap = fixedA.intersect(fixedB).size
    assert(overlap <= 1, s"fixed blocks unexpectedly shared $overlap")
  }

  test("boundary purity: a shared suffix chunks identically past one window") {
    // two payloads with different 2 KB heads and a common 2 KB tail:
    // boundary CONTENT positions in the tail agree after 64 bytes
    val tail = Dedup.cdcPayload(99L, 2048)
    val p1 = Dedup.cdcPayload(1L, 2048) ++ tail
    val p2 = Dedup.cdcPayload(2L, 2048) ++ tail
    val s1 = CdcChunks.chunksOf(p1, Mask).filter(_._1 >= 2048 + 64).map(c => (c._1, c._3))
    val s2 = CdcChunks.chunksOf(p2, Mask).filter(_._1 >= 2048 + 64).map(c => (c._1, c._3))
    // drop the first (possibly straddling) chunk of each list and
    // compare the rest — identical offsets AND hashes
    assert(s1.drop(1) == s2.drop(1))
    assert(s1.drop(1).nonEmpty)
  }

  test("dedupCdcBytes: planted insert variants pair, strangers don't") {
    val docs = (0L until 30L).map(id => (id, s"doc$id")).toDF("doc_id", "text")
    val payloads = Dedup.cdcBytePayloads(spark, docs)
    // fixture shape: %3==0 originals (10), %15==0 variants (2)
    assert(payloads.count() == 12)
    val pairs = Dedup.dedupCdcBytes(spark, payloads)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((0L, 40000000L), (15L, 40000015L)))
  }

  test("cdcGateRows: variant refused, novel admitted, tau boundary (G25)") {
    val docs = (0L until 30L).map(id => (id, s"doc$id")).toDF("doc_id", "text")
    val stored = Dedup.cdcBytePayloads(spark, docs)
      .filter(col("media_id") < Dedup.CdcBytesVariantOffset)
    val index = Dedup.cdcChunkIndex(stored)
    val verdicts = Dedup.cdcGateRows(Dedup.cdcByteIncoming(spark, docs), index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // %15==0 docs in [0,30): 0 and 15 — each sends a variant (refuse)
    // and a novel (admit)
    assert(verdicts == Seq(
      (40000000L, 0L), (40000015L, 0L), (80000000L, 1L), (80000015L, 1L)))
    // tau boundary: a payload whose stored half is boundary-aligned
    // shares exactly its stored-prefix fraction — tau above admits,
    // tau at-or-below refuses (>= is inclusive)
    val seed = Dedup.cdcPayload(7L, 4096)
    val ch = CdcChunks.chunksOf(seed, Mask)
    val cutIdx = ch.indexWhere(c => c._1 + c._2 >= 2048)
    val cut = (ch(cutIdx)._1 + ch(cutIdx)._2).toInt
    val prefix = seed.take(cut) // stored, ends on a real boundary
    val incoming = Seq((1L, prefix ++ Dedup.cdcPayload(99L, 4096 - cut)))
      .toDF("media_id", "payload")
    val idx2 = Dedup.cdcChunkIndex(Seq((0L, prefix)).toDF("media_id", "payload"))
    val frac = cut.toDouble / 4096
    def keepAt(tau: Double) = Dedup.cdcGateRows(incoming, idx2, tau = tau)
      .collect().head.getLong(1)
    // the boundary-purity law makes the shared fraction EXACTLY the
    // prefix bytes (the suffix may straddle one chunk past the cut —
    // allow the window's slack by testing clear of the edge)
    assert(keepAt(math.min(1.0, frac - 0.05)) == 0L)
    assert(keepAt(math.min(1.0, frac + 0.05)) == 1L)
  }

  test("dedupCdcBytes: multiset chunk counts never over-count, df cap gates") {
    // x carries chunk block C three times, y once: shared = 1×len(C),
    // not 3 join rows. Build C as a whole standalone-chunking unit by
    // taking the first boundary-aligned prefix of a keystream.
    val seed = Dedup.cdcPayload(42L, 4096)
    val ch = CdcChunks.chunksOf(seed, Mask)
    // a run of chunks totalling >= 128 bytes, cut on a real boundary
    val cutIdx = ch.indexWhere(c => c._1 + c._2 >= 128)
    val cut = (ch(cutIdx)._1 + ch(cutIdx)._2).toInt
    val block = seed.take(cut)
    val x = block ++ block ++ block
    val y = block
    val payloads = Seq((1L, x), (2L, y)).toDF("media_id", "payload")
    val shared = Dedup.dedupCdcBytes(spark, payloads, minFrac = 0.01)
      .collect()
    // y's bytes all shared, but x is 3× larger: frac vs greatest() is
    // ~1/3 — found at the loose threshold, proving min(count) matching
    assert(shared.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // at the default 0.5-of-the-larger threshold the 3×-vs-1× pair is
    // correctly below the bar
    assert(Dedup.dedupCdcBytes(spark, payloads).count() == 0)
    // df cap: a chunk present in > maxDf payloads generates no pairs
    val many = (1L to 6L).map(i => (i, block)).toDF("media_id", "payload")
    assert(Dedup.dedupCdcBytes(spark, many, maxDf = 2).count() == 0)
    assert(Dedup.dedupCdcBytes(spark, many, maxDf = 6).count() == 15)
  }
}
