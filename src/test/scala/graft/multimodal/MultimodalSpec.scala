package graft.multimodal

import java.awt.image.BufferedImage

import graft.SparkSpec
import BinaryPipeline._

/** F12: multimodal binary-column plumbing — typed schema, batched
  * decode shape, REAL PNG/JPEG decode via javax.imageio, frame
  * sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def docs = Seq(
    (0L, "hello world"), (1L, "abc"), (2L, "0123456789abcdef"), (3L, "xyz")
  ).toDF("doc_id", "text")

  test("pipeline dims: decoded 16/16/3 for images, -1 markers on the fallback path") {
    val got = pipelineDims(spark, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, "image", 16L, 16L, 3L), (1L, "audio", -1L, -1L, -1L),
      (2L, "video", -1L, -1L, -1L), (3L, "image", 16L, 16L, 3L)))
  }

  test("pipeline frames: video media explode to every-2nd frame indices") {
    val got = pipelineFrames(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 2 is video with n_frames = 2%30+1 = 3 → indices 0, 2
    assert(got == Seq((2L, 3L, 0L), (2L, 3L, 2L)))
  }

  test("media table derives typed metadata; image payloads are real encoded images") {
    val m = mediaTable(spark, docs).collect().sortBy(_.media_id)
    assert(m.map(_.kind).toSeq == Seq("image", "audio", "video", "image"))
    // audio/video payloads stay utf-8 text bytes
    assert(m(1).payload.toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(m(1).width == 33 && m(1).height == 25 && m(1).n_frames == 2)
    // image payloads carry codec magic bytes: id 0 → PNG, id 3 → JPEG
    assert(m(0).payload.take(8).toSeq ==
      Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    assert((m(3).payload(0) & 0xff) == 0xff && (m(3).payload(1) & 0xff) == 0xd8)
  }

  test("image decode recovers exact dimensions, channels and pixel stats (PNG fixture)") {
    // solid-color 4x2 PNG: every pixel (R,G,B) = (10, 200, 30)
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, (10 << 16) | (200 << 8) | 30)
    val rec = MediaRecord(7L, "image", encodeImage(img, "png"), 4, 2, 1)
    val f = decodeBatch(Seq(rec)).head
    assert(f.width == 4 && f.height == 2 && f.channels == 3)
    // PNG is lossless → means are exact
    assert(f.features(0) == 10.0 && f.features(1) == 200.0 && f.features(2) == 30.0)
    val luma = 0.299 * 10 + 0.587 * 200 + 0.114 * 30
    assert(math.abs(f.features(3) - luma) < 1e-9) // mean luma
    // solid color → ~zero stddev (one-pass variance carries fp cancellation)
    assert(f.features(4) < 1e-5)
    assert(f.features(7) == 2.0)                  // aspect ratio 4/2
  }

  test("image decode survives JPEG lossy round-trip within tolerance") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, (120 << 16) | (60 << 8) | 180)
    val rec = MediaRecord(9L, "image", encodeImage(img, "jpg"), 8, 8, 1)
    val f = decodeBatch(Seq(rec)).head
    assert(f.width == 8 && f.height == 8 && f.channels == 3)
    assert(math.abs(f.features(0) - 120.0) < 4.0)
    assert(math.abs(f.features(1) - 60.0) < 4.0)
    assert(math.abs(f.features(2) - 180.0) < 4.0)
  }

  test("non-image fallback keeps byte-moment features with -1 decode markers") {
    val feats = decodeFeatures(mediaTable(spark, docs)).collect().sortBy(_.media_id)
    assert(feats.length == 4)
    assert(feats.forall(_.features.length == FeatureDim))
    // decode of "abc" (bytes 97,98,99): f0 = 97/3, f1 = 98/3
    val abc = feats(1)
    assert(abc.kind == "audio" && abc.n_bytes == 3L)
    assert(abc.width == -1 && abc.height == -1 && abc.channels == -1)
    assert(math.abs(abc.features(0) - 97.0 / 3) < 1e-12)
    assert(math.abs(abc.features(1) - 98.0 / 3) < 1e-12)
    // image rows really decoded: dims match the metadata the encoder used
    val img0 = feats(0)
    assert(img0.kind == "image" && img0.width == 32 && img0.height == 24 && img0.channels == 3)
    // identical input → identical checksum on re-run
    val again = decodeFeatures(mediaTable(spark, docs)).collect().sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("poison image payloads take the fallback, never kill the batch") {
    // truncated JPEG: recognized magic, malformed body — ImageIO THROWS
    // on this (it does not return null)
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_3BYTE_BGR)
    val truncated = encodeImage(img, "jpg").take(24)
    val recs = Seq(
      MediaRecord(0L, "image", truncated, 8, 8, 1),
      MediaRecord(1L, "image", "not an image at all".getBytes("UTF-8"), 8, 8, 1),
      MediaRecord(2L, "image", Array.emptyByteArray, 8, 8, 1))
    val out = decodeBatch(recs)
    assert(out.length == 3)
    assert(out.forall(f => f.width == -1 && f.channels == -1))
    // resize of a poison image also falls back instead of throwing
    val rs = resizeBatch(recs, 4, 4)
    assert(rs.length == 3 && rs.forall(r => r.width == 4 && r.height == 4))
  }

  test("decode batching covers every record (batch size boundary)") {
    val many = spark.range(150).selectExpr("id AS doc_id", "repeat('x', 5) AS text")
    val feats = decodeFeatures(mediaTable(spark, many))
    assert(feats.count() == 150)
  }

  test("resize rescales decoded rasters for real; chain stays shuffle-free") {
    val m = mediaTable(spark, docs)
    val small = resize(m, 8, 8)
    val out = small.collect().sortBy(_.media_id)
    assert(out.forall(r => r.width == 8 && r.height == 8))
    // image payloads re-encode as PNG; downstream decode sees 8x8 3-band
    val f0 = decodeBatch(Seq(out(0))).head
    assert(f0.width == 8 && f0.height == 8 && f0.channels == 3)
    // fallback path (audio/video): payload shrinks with the pixel budget
    val src = m.collect().sortBy(_.media_id)
    assert(out(1).payload.length <= src(1).payload.length)
    assert(out.exists(_.payload.length > 0))
    // composes with decode; the whole chain stays shuffle-free
    val plan = decodeFeatures(small).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(300))
  }

  test("nearest-neighbor resize preserves solid-color pixel values exactly") {
    val img = new BufferedImage(6, 4, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, (50 << 16) | (100 << 8) | 150)
    val rec = MediaRecord(2L, "image", encodeImage(img, "png"), 6, 4, 1)
    val f = decodeBatch(resizeBatch(Seq(rec), 3, 2)).head
    assert(f.width == 3 && f.height == 2)
    assert(f.features(0) == 50.0 && f.features(1) == 100.0 && f.features(2) == 150.0)
  }

  test("frame sampling explodes sampled indices for video only") {
    val frames = frameSample(mediaTable(spark, docs), every = 2).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    // only doc 2 is video: n_frames = 2 % 30 + 1 = 3 → frames 0, 2
    assert(frames.toSeq == Seq((2L, 0), (2L, 2)))
  }

  test("pipeline summary witnesses real decode: avg_width 16, avg_channels 3 for images") {
    val rows = pipelineSummary(spark, docs).collect()
    val byKind = rows.map(r => r.getString(0) -> r).toMap
    assert(byKind("image").getAs[Double]("avg_width") == 16.0)
    assert(byKind("image").getAs[Double]("avg_channels") == 3.0)
    assert(byKind("audio").getAs[Double]("avg_width") == -1.0)
  }

  test("aHash60 has known bits on a half-dark half-bright raster (F20)") {
    // left half luma 0, right half luma 255: cells cx >= 5 set, per row
    val img = new BufferedImage(40, 24, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 40)
      img.setRGB(x, y, if (x < 20) 0 else 0xffffff)
    val hash = ImageDedup.aHash60(img)
    val expected = (0 until ImageDedup.GridH)
      .map(cy => 0x3e0L << (cy * ImageDedup.GridW)).reduce(_ | _)
    assert(hash == expected, f"hash=$hash%015x expected=$expected%015x")
  }

  test("aHash60 survives cross-format re-encode and slight resize (F20)") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val bytes = ImageDedup.syntheticBlockImage(41L, 60, 40) // odd id → JPEG
    val img = tryDecode(bytes).get
    val h0 = ImageDedup.aHash60(img)
    // lossless PNG of the same raster: identical hash
    assert(ham(h0, ImageDedup.aHash60(tryDecode(encodeImage(img, "png")).get)) == 0)
    // NN resize to the fixture target: within the band-guaranteed 3
    val resized = resizeBatch(Seq(MediaRecord(41L, "image", bytes, 60, 40, 1)),
      ImageDedup.ResizeW, ImageDedup.ResizeH).head
    assert(ham(h0, ImageDedup.aHash60(tryDecode(resized.payload).get)) <= 3)
    // a different id's block image is far away
    val other = ImageDedup.aHash60(
      tryDecode(ImageDedup.syntheticBlockImage(42L, 60, 40)).get)
    assert(ham(h0, other) > 10)
  }

  test("planted twins pair; distinct block images do not (F20)") {
    import org.apache.spark.sql.functions.col
    // doc_ids 0..29: images are ids % 3 == 0; among them id 0 gets both
    // twins (id % 5 and % 7), ids 15 (% 5) and 21 (% 7) one each
    val d = (0L until 30L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val planted = ImageDedup.plantedImages(spark, d)
    val pairs = ImageDedup.phashPairs(spark, planted,
      graft.ops.LlmQueries.PhashMaxHamming, graft.ops.LlmQueries.PhashMaxDf)
      .select(col("x"), col("y")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val re = ImageDedup.ReencOffset
    val rs = ImageDedup.ResizeOffset
    assert(pairs == Set(
      (0L, re), (0L, rs), (re, rs), // id 0: both twins + twin-twin
      (15L, 15L + re), // id 15: re-encode twin
      (21L, 21L + rs))) // id 21: resize twin
  }

  test("phash search: every planted copy's top-1 is its own source (F34)") {
    val d = (0L until 30L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val planted = ImageDedup.plantedImages(spark, d)
    val re = ImageDedup.ReencOffset
    val rs = ImageDedup.ResizeOffset
    // the copies arrive as queries against the originals' index; the
    // query side is never self-paired, so the twin-twin pair (re, rs)
    // that phashPairs reports cannot appear here
    val out = ImageDedup.phashSearch(spark,
      planted.filter(_.media_id < re),
      planted.filter(_.media_id >= re), 1,
      graft.ops.LlmQueries.PhashMaxHamming, graft.ops.LlmQueries.PhashMaxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(out == Set((re, 0L, 1L), (rs, 0L, 1L),
      (15L + re, 15L, 1L), (21L + rs, 21L, 1L)))
  }
}
