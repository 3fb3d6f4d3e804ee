package graft.tsdb

import graft.SparkSpec

/** The graphite_cgi facade: render-URL time defaults, brace-expanded
  * targets, format selection.
  */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  val spec = Retention.parse("1m:1h,10m:6h")
  def metrics = Seq(
    ("a.x", 0L, 1.0), ("a.x", 60L, 3.0), ("b.y", 60L, 5.0)
  ).toDF("path", "ts", "value")

  test("render csv with brace-expanded target and explicit window") {
    val out = Api.render(spark, metrics, "{a,b}.*",
      Some("1970-01-01T00:00:00"), Some("1970-01-01T00:02:00"), "csv",
      spec, "average", 0.0, now = 120L)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("a.x", "b.y"))
    assert(rows.head._2.startsWith("1970-01-01 00:0"))
  }

  test("render json groups datapoints per target") {
    val out = Api.render(spark, metrics, "a.*", Some("1970-01-01T00:00:00"),
      Some("1970-01-01T00:02:00"), "json", spec, "average", 0.0, now = 120L)
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getString(0) == "a.x")
  }

  test("unknown format rejected; relative times accepted") {
    assertThrows[IllegalArgumentException] {
      Api.render(spark, metrics, "a.*", None, None, "svg", spec, "average", 0.0, 120L)
    }
    // -min relative from, default until=now
    val out = Api.render(spark, metrics, "a.*", Some("-min"), None, "csv",
      spec, "average", 0.0, now = 120L)
    assert(out.collect().nonEmpty)
  }

  test("find/expand/index accept brace queries") {
    val paths = metrics.select("path").distinct()
    assert(Api.find(paths, "{a,b}.*").count() == 2)
    assert(Api.expand(paths, "{a,b}.*", leavesOnly = true).count() == 2)
    assert(Api.index(paths).collect().map(_.getString(0)).toSeq == Seq("a.x", "b.y"))
  }
}
