package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan audit: prints scan pushdown / join strategy / exchange markers
  * for the headline queries so shuffle or broadcast regressions are
  * visible at a glance.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q3_join", "q5_multijoin", "ts_fetch", "ts_fetch_stored",
        "dm_resample", "dedup_minhash", "ann_cosine_topk")
    for (name <- names) {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      val markers = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("PartitionFilters") ||
          l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
          l.contains("ShuffledHashJoin") || l.contains("BroadcastNestedLoopJoin") ||
          l.contains("windowspecdefinition") ||
          (l.contains("Exchange") && !l.contains("Reuse"))).toSeq
      println(s"=== $name")
      markers.foreach(m => println("  " + m.trim.take(170)))
    }
    spark.stop()
  }
}
