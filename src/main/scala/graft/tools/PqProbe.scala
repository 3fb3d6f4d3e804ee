package graft.tools
import org.apache.spark.sql.SparkSession
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.ops.LlmQueries.annPq(spark, "/root/testdata/sf0.01")
    df.write.format("noop").mode("overwrite").save()
    println("[pqprobe] done rows=" + df.count())
    spark.stop()
  }
}
