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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("warm")(docs.count())
    t("quality")(noop(graft.text.Analysis.quality(docs)))
    t("langid")(noop(graft.text.Analysis.langId(spark, docs)))
    spark.catalog.clearCache()
    t("clusters_alone")(noop(graft.ops.LlmQueries.dedupSimhashClusters(spark, dir)))
    spark.catalog.clearCache()
    t("curation_full")(noop(graft.ops.LlmQueries.corpusCuration(spark, dir)))
    spark.catalog.clearCache()
    t("curation_full_2nd")(noop(graft.ops.LlmQueries.corpusCuration(spark, dir)))
    spark.stop()
  }
}
