package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage timing for ann_ivf_pq: where do the ~6.7 bench seconds go? */
object IvfPqProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.LlmQueries._
    val e = graft.core.Tables.embeddings(spark, dir)
    e.count()
    for (i <- 1 to 2) {
      t(s"pqCodebook $i") {
        graft.similarity.Ann.pqCodebook(e, PqSubspaces, PqCodes)
      }
      t(s"full ann_ivf_pq $i") {
        annIvfPq(spark, dir).write.format("noop").mode("overwrite").save()
      }
      t(s"full ann_pq $i") {
        annPq(spark, dir).write.format("noop").mode("overwrite").save()
      }
      t(s"full ann_ivf_quantized $i") {
        annIvfQuantized(spark, dir).write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
