package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** F60 index lifecycle: save/load round trip (search bit-equal through
  * the persisted artifacts), extend ≡ rebuild-encode under the frozen
  * epoch-1 codebooks, epoch pinning/immutability, and the ready-marker
  * swap discipline (a partial epoch is invisible; a published one is
  * immutable).
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private val params = AnnIndex.Params(nCentroids = 16, nProbe = 4,
    m = 8, kc = 16, iters = 1, rateBp = 5000)

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("annidx-spec").toString

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("q_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq

  test("save/load round trip: persisted search bit-equal to in-session") {
    val root = freshRoot()
    assert(AnnIndex.build(spark, e, params, root) == 1L)
    val idx = AnnIndex.load(spark, root)
    assert(idx.epoch == 1L && idx.params == params)
    val q = e.filter(col("vec_id") < 5)
    val persisted = collected(AnnIndex.search(q, idx, k = 3))
    val inSession = collected(Ann.ivfTopKPqTrained(q, e, 3,
      params.nCentroids, params.nProbe, params.m, params.kc,
      params.iters, params.rateBp))
    assert(persisted.nonEmpty && persisted == inSession)
  }

  test("extend == rebuild-encode under the frozen epoch-1 codebooks") {
    val root = freshRoot()
    val base = e.filter(col("vec_id") % 3 =!= 0)
    val delta = e.filter(col("vec_id") % 3 === 0)
    AnnIndex.build(spark, base, params, root)
    val e1 = AnnIndex.load(spark, root)
    assert(AnnIndex.extend(spark, root, delta) == 2L)
    val e2 = AnnIndex.load(spark, root)
    // epoch 2's lists = a from-scratch encode of the UNION under the
    // frozen epoch-1 artifacts, row for row
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cent_id"),
          concat_ws(",", transform(col("pcode"),
            b => b.cast("int").cast("string"))).as("pc"))
        .orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val rebuilt = AnnIndex.encodeLists(e, e1.centroids, e1.book)
    assert(key(e2.lists) == key(rebuilt))
    // frozen books: epoch 2 carries epoch 1's codebook and centroids
    assert(e2.book.flatten.map(_.toSeq) == e1.book.flatten.map(_.toSeq))
    assert(e2.centroids.select("cent_id").orderBy("cent_id").collect().toSeq ==
      e1.centroids.select("cent_id").orderBy("cent_id").collect().toSeq)
  }

  test("epoch pinning: a reader at epoch 1 is untouched by the swap") {
    val root = freshRoot()
    val base = e.filter(col("vec_id") % 3 =!= 0)
    AnnIndex.build(spark, base, params, root)
    val pinned = AnnIndex.load(spark, root, Some(1L))
    val before = pinned.lists.count()
    AnnIndex.extend(spark, root, e.filter(col("vec_id") % 3 === 0))
    assert(AnnIndex.currentEpoch(spark, root) == 2L)
    // the pinned reader's segment set is immutable: same rows after
    // the swap, and a fresh epoch-1 load agrees
    assert(pinned.lists.count() == before)
    assert(AnnIndex.load(spark, root, Some(1L)).lists.count() == before)
    assert(AnnIndex.load(spark, root).lists.count() == e.count())
  }

  test("swap discipline: partial epochs invisible, published ones immutable") {
    val root = freshRoot()
    // no ready epoch → loud
    intercept[IllegalArgumentException](AnnIndex.currentEpoch(spark, root))
    AnnIndex.build(spark, e, params, root)
    // a second build on a published root is refused
    intercept[IllegalArgumentException](AnnIndex.build(spark, e, params, root))
    // a partially-written epoch (dir exists, marker absent) stays
    // invisible to the pointer and unloadable
    Seq((99L, 0L)).toDF("seg", "junk").write
      .parquet(s"$root/epoch=7/segments")
    assert(AnnIndex.currentEpoch(spark, root) == 1L)
    intercept[IllegalArgumentException](AnnIndex.load(spark, root, Some(7L)))
  }
}
