package graft.tsdb

import graft.SparkSpec

/** The WSAPI dispatcher: query-string grammar, route selection, format
  * fallbacks, graph-option wiring (graphite_cgi.lua:401-510).
  */
class CgiSpec extends SparkSpec {
  import spark.implicits._

  val spec = Retention.parse("1m:1h,10m:6h")
  def metrics = Seq(
    ("a.x", 0L, 1.0), ("a.x", 60L, 3.0), ("b.y", 60L, 5.0)
  ).toDF("path", "ts", "value")
  def env = Cgi.Env(metrics, metrics.select("path").distinct(), spec,
    "average", 0.0)

  test("parse_parameters grammar (graphite_cgi.lua:429-441)") {
    // repeated names accumulate in order; empty values dropped
    assert(Cgi.parseParams("target=a&target=b&until=")
      == Map("target" -> Seq("a", "b")))
    // %XX unescapes; '+' is NOT a space (url.unescape is %XX-only)
    assert(Cgi.parseParams("q=a%2Ab+c") == Map("q" -> Seq("a*b+c")))
    // lone '%' survives (only valid hex pairs decode)
    assert(Cgi.parseParams("q=100%") == Map("q" -> Seq("100%")))
    // multi-byte UTF-8 runs decode as BYTES then UTF-8, not char-per-pair
    assert(Cgi.parseParams("q=caf%C3%A9") == Map("q" -> Seq("café")))
    // names are word chars matched anywhere: "a-b=1" still yields b=1
    assert(Cgi.parseParams("a-b=1") == Map("b" -> Seq("1")))
  }

  test("route selection: trailing slash, aliases, 501, 400") {
    // one trailing slash is ignored (graphite_cgi.lua:487)
    assert(Cgi.dispatch(spark, env, "/metrics/index.json/", 120L)
      .collect().map(_.getString(0)).toSeq == Seq("a.x", "b.y"))
    // /metrics is an alias of /metrics/find (graphite_cgi.lua:402-403)
    assert(Cgi.dispatch(spark, env, "/metrics?query=*", 120L).count() == 2)
    val e501 = intercept[UnsupportedOperationException](
      Cgi.dispatch(spark, env, "/dashboard", 120L))
    assert(e501.getMessage.contains("Not Implemented"))
    val e400 = intercept[IllegalArgumentException](
      Cgi.dispatch(spark, env, "/metrics/find?format=treejson", 120L))
    assert(e400.getMessage.contains("query: this parameter is required."))
    // the reference's error document text, with no "requirement failed:"
    val e400t = intercept[IllegalArgumentException](
      Cgi.dispatch(spark, env, "/render?format=csv", 120L))
    assert(e400t.getMessage == "target: this parameter is required.")
  }

  test("find formats: unknown falls back to treejson (graphite_cgi.lua:256)") {
    val tj = Cgi.dispatch(spark, env, "/metrics/find?query=*&format=bogus", 120L)
    assert(tj.columns.toSeq ==
      Seq("allow_children", "expandable", "leaf", "id", "text"))
    val cp = Cgi.dispatch(spark, env, "/metrics/find?query=*&format=completer", 120L)
    assert(cp.columns.toSeq == Seq("is_leaf", "path", "name"))
    // branch paths carry the trailing dot in completer shape
    assert(cp.collect().map(_.getString(1)).sorted.toSeq == Seq("a.", "b."))
  }

  test("expand: only the exact string leavesOnly=1 restricts (graphite_cgi.lua:267)") {
    assert(Cgi.dispatch(spark, env, "/metrics/expand?query=*.*&leavesOnly=1", 120L)
      .count() == 2)
    assert(Cgi.dispatch(spark, env, "/metrics/expand?query=*&leavesOnly=true", 120L)
      .collect().map(_.getString(0)).sorted.toSeq == Seq("a.", "b."))
  }

  test("render: csv/json dispatch; unknown format draws the graph") {
    val csv = Cgi.dispatch(spark, env,
      "/render?target=a.*&from=1970-01-01T00:00:00&until=1970-01-01T00:02:00&format=csv",
      120L)
    assert(csv.collect().map(_.getString(0)).distinct.toSeq == Seq("a.x"))
    // reportStyle[format] or svgRender (graphite_cgi.lua:389)
    val doc = Cgi.dispatch(spark, env,
      "/render?target=a.*&from=1970-01-01T00:00:00&until=1970-01-01T00:02:00&format=png",
      120L).head.getString(0)
    assert(doc.startsWith("<svg xmlns=") && doc.endsWith("</svg>"))
    // multi-target: both series land in one render (graphite_cgi.lua:474)
    val multi = Cgi.dispatch(spark, env,
      "/render?target=a.*&target=b.*&from=1970-01-01T00:00:00&until=1970-01-01T00:02:00&format=csv",
      120L)
    assert(multi.collect().map(_.getString(0)).distinct.sorted.toSeq
      == Seq("a.x", "b.y"))
  }

  test("maxDataPoints consolidates the render; bad values are ignored") {
    // 0..120 on the 1m archive = 3 grid points; budget 2 → factor 2 →
    // 2 output rows (bucket max under the consolidateBy tag)
    val base = "/render?target=consolidateBy(a.x,'max')" +
      "&from=1970-01-01T00:00:00&until=1970-01-01T00:02:00&format=csv"
    val out = Cgi.dispatch(spark, env, base + "&maxDataPoints=2", 120L).collect()
    assert(out.length == 2)
    assert(out.map(_.getString(0)).distinct.toSeq ==
      Seq("""consolidateBy(a.x,"max")"""))
    // bucket 0 = max(t0=1.0, t60=3.0) = 3.0 at the bucket's first
    // timestamp; bucket 1 = the all-null t120 tail stays null
    assert(out.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq ==
      Seq(Some(3.0), None))
    // a budget the series already fits passes through unchanged
    val full = Cgi.dispatch(spark, env, base + "&maxDataPoints=100", 120L).collect()
    assert(full.length == 3)
    // non-numeric / non-positive budgets read as absent, not an error
    assert(Cgi.dispatch(spark, env, base + "&maxDataPoints=abc", 120L)
      .collect().length == 3)
    assert(Cgi.dispatch(spark, env, base + "&maxDataPoints=0", 120L)
      .collect().length == 3)
  }

  test("svg graph options ride the URL (L_DataGraph.lua:199-203,255-278)") {
    val doc = Cgi.dispatch(spark, env,
      "/render?target=a.x&target=b.y&from=1970-01-01T00:00:00" +
        "&until=1970-01-01T00:02:00&aliases=%7Bup,down%7D" +
        "&vtitle=load+avg&bgcolor=%23ffffff&height=300&width=400&title=T",
      120L).head.getString(0)
    // positional aliases name the expanded targets in order
    assert(doc.contains("■ up</tspan>") && doc.contains("■ down</tspan>"))
    // vtitle does its own '+'→' ' (L_DataGraph.lua:272)
    assert(doc.contains("load avg"))
    assert(doc.contains("""width="400" height="300""""))
    assert(doc.contains("""fill="#ffffff""""))
    assert(doc.contains("<title>T</title>"))
    // hideLegend: ANY present value hides (Lua truthiness)
    val hid = Cgi.dispatch(spark, env,
      "/render?target=a.x&from=1970-01-01T00:00:00&until=1970-01-01T00:02:00" +
        "&hideLegend=0", 120L).head.getString(0)
    assert(!hid.contains("<tspan"))
  }
}
