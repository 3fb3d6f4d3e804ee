package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.F12): opaque `binary`
  * payloads + typed metadata, a batched decode→feature-extract stage,
  * and frame sampling.
  *
  * The decode step is a DETERMINISTIC STUB (no image/audio codecs in
  * this environment); everything around it — the typed schema, the
  * partition-preserving batched `mapPartitions` shape a real vectorized
  * decoder needs (accumulate k records, decode as one batch, emit), and
  * the frame-sampling plan — is real and tested. Swapping `decodeBatch`
  * for a JNI/codec call changes no plan shape.
  */
object BinaryPipeline {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      features: Array[Double], checksum: Long)

  val FeatureDim = 8
  val DecodeBatchSize = 64

  /** Synthesize a media table from `documents`: payload = utf-8 bytes,
    * metadata derived deterministically from doc_id.
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 64 + 32).cast("int").as("width"),
      (col("doc_id") % 48 + 24).cast("int").as("height"),
      (col("doc_id") % 30 + 1).cast("int").as("n_frames")
    ).as[MediaRecord]
  }

  /** The stubbed vectorized decode: one call per accumulated batch —
    * the shape a real decoder (libjpeg/ffmpeg via JNI, or an Arrow
    * batch handed to a Python worker) requires. Features here are byte
    * histogram moments; a real decoder returns pixel/spectral features.
    */
  private[multimodal] def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = r.payload
      val feats = (0 until FeatureDim).map { k =>
        var s = 0.0
        var i = k
        while (i < bytes.length) { s += (bytes(i) & 0xff); i += FeatureDim }
        if (bytes.length > 0) s / bytes.length else 0.0
      }.toArray
      val checksum = bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      MediaFeatures(r.media_id, r.kind, bytes.length.toLong, feats, checksum)
    }

  /** Partition-preserving batched decode: no shuffle, each partition
    * streams through in `DecodeBatchSize` groups.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(DecodeBatchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Stubbed batched resize: payload byte-budget scales with the target
    * pixel count (a real impl calls the codec's scaler on the batch);
    * width/height metadata updated. Deterministic: every k-th byte kept.
    */
  private[multimodal] def resizeBatch(batch: Seq[MediaRecord],
                                      w: Int, h: Int): Seq[MediaRecord] =
    batch.map { r =>
      val srcPx = math.max(1L, r.width.toLong * r.height)
      val budget = math.min(r.payload.length.toLong,
        math.max(1L, r.payload.length.toLong * (w.toLong * h) / srcPx)).toInt
      val step = math.max(1, r.payload.length / math.max(1, budget))
      val out = r.payload.indices.by(step).map(r.payload).toArray
      r.copy(payload = out, width = w, height = h)
    }

  /** Resize to target dimensions — same partition-preserving batched
    * shape as decodeFeatures (resize is a codec call in a real
    * pipeline); composes with decodeFeatures/frameSample with no
    * shuffle anywhere in the chain.
    */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(DecodeBatchSize).flatMap(g => resizeBatch(g.toSeq, w, h)))
  }

  /** Frame sampling for video payloads: one row per sampled frame index
    * (0, every, 2·every, …) — sequence+explode, no driver loop.
    */
  def frameSample(media: Dataset[MediaRecord], every: Int): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))

  /** Driver-checkable summary (rows-only): per-kind feature stats over
    * the full chain — resize → batched decode — plus sampled-frame
    * counts for video. The whole per-record chain is shuffle-free; the
    * only exchanges are the two final per-kind aggregations.
    */
  def pipelineSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = mediaTable(spark, docs)
    val feats = decodeFeatures(resize(media, 16, 16))
    val frames = frameSample(media, every = 2)
      .groupBy(lit("video").as("kind"))
      .agg(count(lit(1)).as("n_sampled_frames"))
    feats.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(element_at(col("features"), 1)) - 1e-9, 4).as("avg_f0"),
        (sum(col("checksum")) % 1000000007L).as("checksum_agg"))
      .join(frames, Seq("kind"), "left")
      .withColumn("n_sampled_frames", coalesce(col("n_sampled_frames"), lit(0L)))
      .orderBy(col("kind"))
  }
}
