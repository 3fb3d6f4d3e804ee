package graft.multimodal

import graft.SparkSpec
import BinaryPipeline._

/** F12: multimodal binary-column plumbing — typed schema, batched
  * decode shape, frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def docs = Seq(
    (0L, "hello world"), (1L, "abc"), (2L, "0123456789abcdef"), (3L, "xyz")
  ).toDF("doc_id", "text")

  test("media table derives typed metadata and binary payload") {
    val m = mediaTable(spark, docs).collect().sortBy(_.media_id)
    assert(m.map(_.kind).toSeq == Seq("image", "audio", "video", "image"))
    assert(m(0).payload.toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(m(1).width == 33 && m(1).height == 25 && m(1).n_frames == 2)
  }

  test("decode stub is deterministic and batch-shaped") {
    val feats = decodeFeatures(mediaTable(spark, docs)).collect().sortBy(_.media_id)
    assert(feats.length == 4)
    assert(feats.forall(_.features.length == FeatureDim))
    // decode of "abc" (bytes 97,98,99): f0 = 97/3, f1 = 98/3, f2 = 99/3
    val abc = feats(1)
    assert(abc.n_bytes == 3L)
    assert(math.abs(abc.features(0) - 97.0 / 3) < 1e-12)
    assert(math.abs(abc.features(1) - 98.0 / 3) < 1e-12)
    // identical input → identical checksum on re-run
    val again = decodeFeatures(mediaTable(spark, docs)).collect().sortBy(_.media_id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("decode batching covers every record (batch size boundary)") {
    val many = spark.range(150).selectExpr("id AS doc_id", "repeat('x', 5) AS text")
    val feats = decodeFeatures(mediaTable(spark, many))
    assert(feats.count() == 150)
  }

  test("resize scales payload budget with target pixels, no shuffle") {
    val m = mediaTable(spark, docs)
    val small = resize(m, 8, 8)
    val out = small.collect().sortBy(_.media_id)
    assert(out.forall(r => r.width == 8 && r.height == 8))
    // downscale: 8x8 = 64 px vs source >= 32x24 = 768 px → payload shrinks
    val src = m.collect().sortBy(_.media_id)
    assert(out.zip(src).forall { case (o, s) => o.payload.length <= s.payload.length })
    assert(out.exists(_.payload.length > 0))
    // composes with decode; the whole chain stays shuffle-free
    val plan = decodeFeatures(small).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(300))
  }

  test("frame sampling explodes sampled indices for video only") {
    val frames = frameSample(mediaTable(spark, docs), every = 2).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    // only doc 2 is video: n_frames = 2 % 30 + 1 = 3 → frames 0, 2
    assert(frames.toSeq == Seq((2L, 0), (2L, 2)))
  }
}
