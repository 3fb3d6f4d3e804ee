package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (scratch; not part of the library API). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.core.Tables.documents(spark, dir)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"## $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("warm")(docs.count())
    t("simhash_only")(graft.dedup.Dedup.simhash(spark, docs)
      .write.format("noop").mode("overwrite").save())
    val sim = graft.dedup.Dedup.simhash(spark, docs).cache()
    t("sim_materialize")(sim.write.format("noop").mode("overwrite").save())
    val sigs = sim.select("simhash").distinct()
    t("keyed_cascade_over_cached_sim")(
      graft.dedup.Dedup.cappedBandKeys(spark, sigs, 64)
        .write.format("noop").mode("overwrite").save())
    val keyed = graft.dedup.Dedup.cappedBandKeys(spark, sigs, 64).cache()
    t("keyed_materialize")(keyed.write.format("noop").mode("overwrite").save())
    t("pair_join")(keyed.as("a").join(keyed.as("b"),
      col("a.band") === col("b.band") && col("a.lvl") === col("b.lvl") &&
        col("a.bkey") === col("b.bkey") && col("a.simhash") < col("b.simhash"))
      .select(col("a.simhash").as("s1"), col("b.simhash").as("s2")).distinct()
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
      .filter(col("hamming") <= 6).write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    t("full_capped")(graft.ops.LlmQueries.dedupSimhashCapped(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    t("full_exact")(graft.ops.LlmQueries.dedupSimhash(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
