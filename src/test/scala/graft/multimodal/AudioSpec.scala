package graft.multimodal

import graft.SparkSpec
import Audio._
import BinaryPipeline.MediaRecord

/** F51: real RIFF/WAVE PCM16 codec + framed feature extraction. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("wav round-trip: header fields, chunk walk, exact samples") {
    val samples = Array[Short](3, -2, 5, 0, -1, 32767, -32768)
    val bytes = encodeWav(44100, samples)
    // canonical header magic
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val clip = decodeWav(bytes).get
    assert(clip.sampleRate == 44100 && clip.channels == 1)
    assert(clip.samples.toSeq == samples.toSeq)
  }

  test("wav reader tolerates unknown chunks and rejects poison payloads") {
    val base = encodeWav(8000, Array[Short](1, 2, 3))
    // splice an unknown 5-byte LIST chunk (odd size → 1 pad byte)
    // between the fmt and data chunks
    val fmtEnd = 12 + 8 + 16
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9, 9, 0)
    val spliced = base.take(fmtEnd) ++ junk ++ base.drop(fmtEnd)
    // fix the RIFF size field (little-endian at offset 4)
    val riffSize = spliced.length - 8
    for (k <- 0 until 4) spliced(4 + k) = (riffSize >> (8 * k)).toByte
    val clip = decodeWav(spliced).get
    assert(clip.samples.toSeq == Seq[Short](1, 2, 3))
    // poison: garbage, truncated file, truncated chunk length
    assert(decodeWav("not a wav at all".getBytes).isEmpty)
    assert(decodeWav(base.take(10)).isEmpty)
    val lying = base.clone()
    lying(43) = 127 // data chunk claims more bytes than remain
    assert(decodeWav(lying).isEmpty)
    // stereo PCM16 rejects too: frameBatch assumes a mono stream, so
    // an interleaved payload must take the None poison path rather
    // than silently framing interleaved samples
    val stereo = base.clone()
    stereo(22) = 2 // fmt channels field (LE short at offset 22) = 2
    assert(decodeWav(stereo).isEmpty)
    // undecodable payload emits no rows, kills no task
    val out = frameBatch(Seq(MediaRecord(1L, "audio",
      "garbage".getBytes, -1, -1, 1)), 4)
    assert(out.isEmpty)
  }

  test("frame features: hand-computed energy and zero crossings, partial tail") {
    val rec = MediaRecord(9L, "audio",
      encodeWav(8000, Array[Short](3, -2, 5, 0, -1)), -1, -1, 1)
    val out = frameBatch(Seq(rec), frameSize = 4)
    assert(out.length == 2)
    val f0 = out(0)
    // frame 0 = [3,-2,5,0]: energy 9+4+25+0; crossings (3,-2),(-2,5)
    assert(f0.n == 4 && f0.energy_sq == 38L && f0.zero_cross == 2L)
    // tail frame = [-1]: no in-frame neighbour → no crossing
    val f1 = out(1)
    assert(f1.frame_idx == 1 && f1.n == 1 && f1.energy_sq == 1L && f1.zero_cross == 0L)
    // the (0, -1) boundary pair spans frames — must NOT count anywhere
    assert(out.map(_.zero_cross).sum == 2L)
  }

  test("driver shape: real decode matches the id-arithmetic model corpus-wide") {
    val docs = Seq.tabulate(12)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val rows = frameFeatures(spark, docs).collect()
    // audio kind = doc_id % 3 == 1
    assert(rows.map(_.getLong(0)).distinct.sorted.toSeq == Seq(1L, 4L, 7L, 10L))
    rows.groupBy(_.getLong(0)).foreach { case (id, fs) =>
      val ns = clipSamples(id)
      assert(fs.length == (ns + FrameSize - 1) / FrameSize)
      assert(fs.map(_.getInt(4)).sum == ns)       // frame sizes cover the clip
      assert(fs.head.getInt(1) == clipRate(id))   // decoded rate round-trips
      // independent model: recompute every frame from sampleValue
      fs.sortBy(_.getInt(3)).zipWithIndex.foreach { case (r, f) =>
        val lo = f * FrameSize
        val hi = math.min(lo + FrameSize, ns)
        val vals = (lo until hi).map(i => sampleValue(id, i).toLong)
        assert(r.getLong(5) == vals.map(v => v * v).sum, s"energy id=$id f=$f")
        assert(r.getLong(6) == vals.sliding(2).count {
          case Seq(a, b) => a * b < 0; case _ => false }, s"zc id=$id f=$f")
      }
    }
  }
}
