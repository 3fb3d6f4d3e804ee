package graft.tsdb

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MetricStore: day-partitioned persistence must (a) round-trip fetch
  * results identical to the in-memory path, (b) prune partitions by
  * time range, (c) push the glob's literal prefix into the parquet scan.
  */
class MetricStoreSpec extends SparkSpec {
  import spark.implicits._

  val spec = Retention.parse("1m:1d,10m:30d")

  def metrics = Seq(
    ("a.x.v", 0L, 1.0), ("a.x.v", 90000L, 3.0), ("a.x.v", 90060L, 5.0),
    ("a.y.v", 90030L, 10.0), ("b.z.v", 90000L, 2.0)
  ).toDF("path", "ts", "value")

  lazy val root: String = {
    val dir = Files.createTempDirectory("graft-store").toString
    MetricStore.writeArchives(metrics, spec, "average", 0.0, dir)
    dir
  }

  test("stored fetch equals in-memory fetch") {
    val now = 90120L
    val stored = MetricStore.fetchStored(spark, root, spec, "a.*.v", 89940L, now, now)
      .orderBy("path", "t").collect().map(r => (r.getString(0), r.getLong(1)))
    val direct = Fetch.fetch(spark, metrics, "a.*.v", spec, "average", 0.0,
      89940L, now, now)
      .orderBy("path", "t").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(stored.toSeq == direct.toSeq)
    assert(stored.nonEmpty)
  }

  test("day partitions are pruned by the time-range filter") {
    val now = 90120L
    val plan = MetricStore.fetchStored(spark, root, spec, "a.*.v", 89940L, now, now)
      .queryExecution.executedPlan.toString
    // data spans day=0 and day=86400; the window only needs day=86400
    assert(plan.contains("day"), plan.take(400))
    val scanned = MetricStore.fetchStored(spark, root, spec, "a.*.v", 89940L, now, now)
      .queryExecution.optimizedPlan.collectLeaves().map(_.toString)
    assert(!scanned.exists(_.contains("day=0")) || scanned.isEmpty)
  }

  test("glob literal prefix reaches the scan as StringStartsWith") {
    val now = 90120L
    val plan = MetricStore.fetchStored(spark, root, spec, "a.*.v", 89940L, now, now)
      .queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith(path,a.")) // pushed to parquet
  }

  test("literal target pushes as EqualTo") {
    assert(MetricStore.pathPredicate("a.x.v").toString.contains("="))
    val now = 90120L
    val plan = MetricStore.fetchStored(spark, root, spec, "a.x.v", 89940L, now, now)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(path,a.x.v)"))
  }
}
