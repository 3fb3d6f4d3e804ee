package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import BinaryPipeline.{DecodeBatchSize, MediaRecord}

/** F51: REAL audio decode + framed feature extraction over opaque
  * `binary` payloads (SURVEY.md §2.F51).
  *
  * RIFF/WAVE PCM is a CONTAINER, not a codec — header + little-endian
  * sample words — so unlike compressed audio (no codec libs in this
  * container) the WAV path can be fully real with `java.nio` alone:
  * the writer packs canonical 44-byte-header mono PCM16 files, the
  * reader validates RIFF/WAVE magic, walks the chunk list (skipping
  * unknown chunks, honoring the odd-size pad byte) and decodes `fmt `
  * + `data` into samples. The decode stage keeps the partition-
  * preserving batched `mapPartitions` shape of the image path
  * ([[BinaryPipeline.decodeFeatures]]): swapping in an ffmpeg/JNI
  * batch call for compressed formats changes no plan shape.
  *
  * Features per fixed-size frame (the STFT-hop shape every audio
  * pipeline uses): sample count, Σs² energy (BIGINT — integer-exact,
  * so the DuckDB oracle matches hash-for-hash with no float
  * tolerance anywhere), and the zero-crossing count (adjacent
  * in-frame pairs with strictly negative product). Payload samples
  * are deterministic id arithmetic — s(i) = ((id·31 + i·7) mod 2003)
  * − 1001 — so the oracle replays the ENTIRE pipeline in SQL without
  * touching a byte: a wrong header field, a chunk-walk bug, or a
  * sample-order flip all surface as hash mismatches.
  */
object Audio {

  /** Decoded clip metadata + samples. */
  final case class AudioClip(sampleRate: Int, channels: Int, samples: Array[Short])

  /** One frame's features; `energy_sq`/`zero_cross` are integer-exact. */
  final case class AudioFrame(
      media_id: Long, sample_rate: Int, n_samples: Int,
      frame_idx: Int, n: Int, energy_sq: Long, zero_cross: Long)

  /** Frame size in samples (non-overlapping hop). */
  val FrameSize = 256

  /** Deterministic synthetic sample value — pure id arithmetic, the
    * single source both the WAV writer and the SQL oracle replay.
    */
  def sampleValue(id: Long, i: Long): Short =
    (((id * 31 + i * 7) % 2003) - 1001).toShort

  /** Id-arithmetic clip shape: length (includes a partial tail frame
    * for most ids — the boundary the frame loop must get right) and
    * sample rate.
    */
  def clipSamples(id: Long): Int = (512 + id % 777).toInt
  def clipRate(id: Long): Int = (8000 + (id % 4) * 4000).toInt

  /** Pack mono PCM16 samples as a canonical RIFF/WAVE file. */
  private[multimodal] def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                       // PCM
    bb.putShort(1)                       // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)            // byte rate
    bb.putShort(2)                       // block align
    bb.putShort(16)                      // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Real chunk-walking WAV reader: validates magic, tolerates unknown
    * chunks (and RIFF's odd-size pad byte), requires PCM16. Returns
    * None on anything malformed — at 100 TB a poison payload takes the
    * undecoded path, never kills the task (the
    * [[BinaryPipeline.tryDecode]] rule).
    */
  private[multimodal] def decodeWav(bytes: Array[Byte]): Option[AudioClip] = {
    try {
      if (bytes.length < 12) return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4)
      bb.get(magic)
      if (new String(magic, "US-ASCII") != "RIFF") return None
      bb.getInt // declared RIFF size (trust the buffer, not the field)
      bb.get(magic)
      if (new String(magic, "US-ASCII") != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (format, channels, rate)
      var bits = 0
      var data: Option[Array[Short]] = None
      while (bb.remaining() >= 8) {
        bb.get(magic)
        val id = new String(magic, "US-ASCII")
        val size = bb.getInt
        if (size < 0 || size > bb.remaining()) return None
        val next = bb.position() + size + (size & 1) // odd chunks pad
        id match {
          case "fmt " =>
            if (size < 16) return None
            val audioFormat = bb.getShort.toInt
            val channels = bb.getShort.toInt
            val rate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            bits = bb.getShort.toInt
            fmt = Some((audioFormat, channels, rate))
          case "data" =>
            val out = new Array[Short](size / 2)
            var i = 0
            while (i < out.length) { out(i) = bb.getShort; i += 1 }
            data = Some(out)
          case _ => () // skip unknown chunk (LIST, cue, ...)
        }
        bb.position(math.min(next, bb.limit()))
      }
      // ch == 1 is part of the guard, not just metadata: frameBatch
      // treats clip.samples as ONE mono stream, so a stereo payload
      // that decoded here would silently frame interleaved samples
      // (wrong energies/zero-crossings, doubled n_samples) instead of
      // taking the undecoded/None poison path.
      for ((f, ch, rate) <- fmt if f == 1 && bits == 16 && ch == 1; d <- data)
        yield AudioClip(rate, ch, d)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The audio-kind slice of the media table with REAL WAV payloads
    * (the [[BinaryPipeline.mediaTable]] kind rule: doc_id % 3 == 1),
    * encoded executor-side via a partition-preserving typed map.
    */
  def audioTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"), lit("audio").as("kind"),
      encode(lit(""), "UTF-8").as("payload"),
      lit(-1).as("width"), lit(-1).as("height"), lit(1).as("n_frames"))
      .filter(col("media_id") % 3 === 1)
      .as[MediaRecord]
      .map { r =>
        val n = clipSamples(r.media_id)
        val samples = Array.tabulate(n)(i => sampleValue(r.media_id, i))
        r.copy(payload = encodeWav(clipRate(r.media_id), samples))
      }
  }

  /** Decode a batch of WAV payloads and emit per-frame features —
    * imperative per-sample loops INSIDE the batched codec stage (the
    * one place the brief sanctions them), nothing but narrow typed
    * rows on the wire. Undecodable payloads emit nothing.
    */
  private[multimodal] def frameBatch(batch: Seq[MediaRecord],
                                     frameSize: Int): Seq[AudioFrame] =
    batch.flatMap { r =>
      decodeWav(r.payload).toSeq.flatMap { clip =>
        val s = clip.samples
        val nFrames = (s.length + frameSize - 1) / frameSize
        (0 until nFrames).map { f =>
          val lo = f * frameSize
          val hi = math.min(lo + frameSize, s.length)
          var energy = 0L
          var zc = 0L
          var i = lo
          while (i < hi) {
            energy += s(i).toLong * s(i)
            if (i > lo && s(i - 1).toInt * s(i) < 0) zc += 1
            i += 1
          }
          AudioFrame(r.media_id, clip.sampleRate, s.length, f, hi - lo, energy, zc)
        }
      }
    }

  /** F51 operator: audio table → batched real decode → one row per
    * frame. Map-only end to end (the final orderBy is presentation;
    * Verify's single-file write makes it the output order).
    */
  def frameFeatures(spark: SparkSession, docs: DataFrame,
                    frameSize: Int = FrameSize): DataFrame = {
    import spark.implicits._
    audioTable(spark, docs)
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(g => frameBatch(g.toSeq, frameSize)))
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))
  }
}
