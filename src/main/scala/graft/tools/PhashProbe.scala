package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot diagnostic: hamming margins of the image aHash fixture —
  * planted-twin distances (must stay ≤ band-guaranteed 3) vs the
  * closest distinct-original pair (must stay well above the threshold).
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = graft.core.Tables.documents(spark, dir)
    val planted = graft.multimodal.ImageDedup.plantedImages(spark, docs)
    val hs = graft.multimodal.ImageDedup.imageHashes(planted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val origs = hs.keys.filter(_ < graft.multimodal.ImageDedup.ReencOffset).toSeq.sorted
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val reencD = origs.flatMap(i => hs.get(i + graft.multimodal.ImageDedup.ReencOffset)
      .map(h => ham(hs(i), h)))
    val reszD = origs.flatMap(i => hs.get(i + graft.multimodal.ImageDedup.ResizeOffset)
      .map(h => ham(hs(i), h)))
    val cross = for {
      (a, ia) <- origs.zipWithIndex; b <- origs.drop(ia + 1)
    } yield ham(hs(a), hs(b))
    println(s"n_images=${origs.size} reenc_twins=${reencD.size} resize_twins=${reszD.size}")
    println(s"reenc hamming: max=${if (reencD.nonEmpty) reencD.max else -1} dist=${reencD.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)}")
    println(s"resize hamming: max=${if (reszD.nonEmpty) reszD.max else -1} dist=${reszD.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)}")
    println(s"cross-original hamming: min=${cross.min} p1=${cross.sorted.apply(cross.size / 100)}")
    val bad = origs.flatMap(i => hs.get(i + graft.multimodal.ImageDedup.ResizeOffset)
      .map(h => (i, ham(hs(i), h)))).filter(_._2 >= 3)
    println(s"resize outliers (id, d, parity, w, h): ${bad.map { case (i, d) =>
      (i, d, i % 2, i % 64 + 32, i % 48 + 24) }}")
    spark.stop()
  }
}
