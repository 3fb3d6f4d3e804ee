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

  test("multi-target render unions every target's series (graphite_cgi.lua:474)") {
    val out = Api.render(spark, metrics, Seq("a.*", "b.*"),
      Some("1970-01-01T00:00:00"), Some("1970-01-01T00:02:00"), "csv",
      spec, "average", 0.0, now = 120L)
    val targets = out.collect().map(_.getString(0)).distinct.sorted
    assert(targets.toSeq == Seq("a.x", "b.y"))
    val doc = Api.render(spark, metrics, Seq("a.*", "b.*"),
      Some("1970-01-01T00:00:00"), Some("1970-01-01T00:02:00"), "svg",
      spec, "average", 0.0, now = 120L).head.getString(0)
    assert(doc.contains("<title>a.*,b.*</title>"))
    assert("<polyline ".r.findAllIn(doc).size == 2)
  }

  test("unknown format rejected; relative times accepted") {
    assertThrows[IllegalArgumentException] {
      Api.render(spark, metrics, "a.*", None, None, "png", spec, "average", 0.0, 120L)
    }
    // -min relative from, default until=now
    val out = Api.render(spark, metrics, "a.*", Some("-min"), None, "csv",
      spec, "average", 0.0, now = 120L)
    assert(out.collect().nonEmpty)
  }

  test("maxDataPoints archive shortcut only for average stores (ADVICE r9)") {
    // window [1800, 3600), budget 3: the 10m archive's 4 grid points
    // satisfy the budget, but its stored values are METHOD-aggregates —
    // graphite-web would render-consolidate the finest (1m) archive with
    // the untagged default function (average). The shortcut is therefore
    // method-gated: an average store reads the 10m level (grid 1800,
    // 2400, 3000, 3600 → factor-2 consolidation keeps 1800, 3000); a sum
    // store keeps the 1m fetch (31 points → factor 11 keeps 1800, 2460,
    // 3120) and the budget applies at render consolidation only.
    val m = Seq(("a.x", 1810L, 1.0), ("a.x", 2405L, 3.0), ("a.x", 3010L, 5.0))
      .toDF("path", "ts", "value")
    def tsOf(method: String): Seq[String] =
      Api.render(spark, m, Seq("a.x"), Some("1970-01-01T00:30:00"),
        Some("1970-01-01T01:00:00"), "csv", spec, method, 0.0, now = 3600L,
        svgOpts = None, maxDataPoints = Some(3))
        .collect().map(_.getString(1)).toSeq
    assert(tsOf("average") == Seq("1970-01-01 00:30:00", "1970-01-01 00:50:00"))
    assert(tsOf("sum") == Seq("1970-01-01 00:30:00", "1970-01-01 00:41:00",
      "1970-01-01 00:52:00"))
  }

  test("stale window returns an empty series with the fetch schema, not a schemaless frame") {
    // fromTime > now → Fetch.select = None; the multi-target union and
    // the csv render must still resolve (path, t, value)
    val out = Api.render(spark, metrics, Seq("a.*", "b.*"),
      Some("2100-01-01T00:00:00"), Some("2100-01-02T00:00:00"), "csv",
      spec, "average", 0.0, now = 120L)
    assert(out.columns.toSeq == Seq("target", "ts_str", "value"))
    assert(out.count() == 0)
  }

  test("xff-failing path still returns all-null rows: grid from matched paths") {
    // coarse archive selected (fine can't reach from=120 at now=7200);
    // no data lands inside the window, and b.y's only coarse bucket
    // fails xff=0.9 — BOTH paths must still appear, all values null
    // (the whisper file exists, L_DataWhisper.lua:525-552)
    val out = Fetch.fetch(spark, metrics, "*.*",
      Retention.parse("1m:2m,2m:2h"), "average", 0.9, 120L, 240L, 7200L)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq == Seq("a.x", "b.y"))
    assert(rows.forall(_.isNullAt(2)))
  }

  test("yMin/yMax pin the y axis; bgcolor escapes in attribute position") {
    val doc = Api.render(spark, metrics, Seq("a.x"),
      Some("1970-01-01T00:00:00"), Some("1970-01-01T00:02:00"), "svg",
      spec, "average", 0.0, now = 120L,
      svgOpts = Some(Render.SvgOptions(
        yMin = Some(0.0), yMax = Some(100.0),
        bgcolor = Some("\"/><script>x</script>")))).head.getString(0)
    // axis = the 0..100 viewWindow, not the data bounds 1..3:
    // y(v) = 460 - v/100*420 → 455.8 and 447.4 (data-bound scaling
    // would map the extremes to 460.0 and 40.0)
    assert(doc.contains("455.8") && doc.contains("447.4"))
    // attribute injection neutralized
    assert(!doc.contains("<script>"))
    assert(doc.contains("&quot;"))
  }

  test("find/expand/index accept brace queries") {
    val paths = metrics.select("path").distinct()
    assert(Api.find(paths, "{a,b}.*").count() == 2)
    assert(Api.expand(paths, "{a,b}.*", leavesOnly = true).count() == 2)
    assert(Api.index(paths).collect().map(_.getString(0)).toSeq == Seq("a.x", "b.y"))
  }

  test("find formats: treejson is default, completer adds trailing dots") {
    val paths = Seq("a.x", "a.x.v").toDF("path")
    // "a.x" is both a leaf and a branch → one row each
    val tj = Api.findFormat(paths, "a.*").orderBy("leaf").collect()
    assert(tj.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toSeq
      == Seq((1L, 1L, 0L, "a.x", "x"), (0L, 0L, 1L, "a.x", "x")))
    val cp = Api.findFormat(paths, "a.*", "completer").orderBy("is_leaf").collect()
    assert(cp.map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((0L, "a.x."), (1L, "a.x")))
    assertThrows[IllegalArgumentException](Api.findFormat(paths, "a.*", "nope"))
  }

  test("svg render: polyline per series, staircase step duplication") {
    // connected (average): 2 points for a.x, 1 for b.y — no duplicates
    val conn = Api.render(spark, metrics, "*.*",
      Some("1970-01-01T00:00:00"), Some("1970-01-01T00:02:00"), "svg",
      spec, "average", 0.0, now = 120L).head.getString(0)
    assert(conn.startsWith("<svg xmlns="))
    assert(conn.endsWith("</svg>"))
    assert(conn.contains("<title>*.*</title>"))
    assert("<polyline ".r.findAllIn(conn).size == 2)
    assert(conn.contains("<title>a.x</title>") && conn.contains("<title>b.y</title>"))
    def seriesPoints(doc: String, path: String): Int = {
      val re = ("""points="([^"]*)"><title>""" + java.util.regex.Pattern.quote(path)).r
      """\d+\.\d,\d+\.\d""".r.findAllIn(re.findFirstMatchIn(doc).get.group(1)).size
    }
    // a.x has values at t=0 and t=60: connected → 2 coordinate pairs
    assert(seriesPoints(conn, "a.x") == 2)
    // staircase (method=last): hold fills t=120 for a.x (3 points) and
    // each step adds the previous-value duplicate → 3 + 2 = 5 pairs
    val stair = Api.render(spark, metrics, "a.*",
      Some("1970-01-01T00:00:00"), Some("1970-01-01T00:02:00"), "svg",
      spec, "last", 0.0, now = 120L).head.getString(0)
    assert(seriesPoints(stair, "a.x") == 5)
  }

  test("svg struct extraction: per-series rows recover the staircase geometry") {
    // the C6s-struct driver query's parse, pinned on the tiny fixture:
    // per-polyline title + coordinate pairs come back as rows, the
    // staircase invariant (2n-1 points per series) holds, and x is
    // monotone within a series
    val doc = Api.render(spark, metrics, "a.*",
      Some("1970-01-01T00:00:00"), Some("1970-01-01T00:02:00"), "svg",
      spec, "last", 0.0, now = 120L)
    import org.apache.spark.sql.functions._
    val got = doc
      .select(explode(expr(
        """regexp_extract_all(svg, '<polyline[^>]*points="[^"]*"><title>[^<]*</title>', 0)""")).as("el"))
      .select(regexp_extract(col("el"), "<title>([^<]*)</title>", 1).as("path"),
        split(regexp_extract(col("el"), "points=\"([^\"]*)\"", 1), " ").as("pts"))
      .select(col("path"), posexplode(col("pts")).as(Seq("idx", "pt")))
      .select(col("path"), col("idx"),
        split(col("pt"), ",").getItem(0).cast("double").as("x"),
        split(col("pt"), ",").getItem(1).cast("double").as("y"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    // a.x: 3 grid points (t=120 hold-filled) → 2*3-1 = 5 staircase pairs
    assert(got.count(_._1 == "a.x") == 5)
    val xs = got.filter(_._1 == "a.x").sortBy(_._2).map(_._3)
    assert(xs.toSeq == xs.sorted.toSeq && xs.head == 40.0)
    assert(got.forall(p => p._3 >= 40.0 && p._4 <= 460.0))
  }

  test("svg options: area fill, yMax clip, alias, legend") {
    val fetched = Fetch.fetch(spark, metrics, "a.*", spec, "average", 0.0,
      0L, 120L, 200L)
    val doc = Render.svg(fetched, "average", Render.SvgOptions(
      yMax = Some(2.0), areaMode = "all",
      aliases = Map("a.x" -> "series one"))).head.getString(0)
    assert(doc.contains("<polygon") && doc.contains("fill-opacity"))
    assert(doc.contains("<title>series one</title>")) // alias applied
    assert(doc.contains("■ series one"))              // legend row
    // yMax=2.0 clamps both points (values 1.0 and 3.0 → 1.0 and 2.0);
    // the larger value maps to the viewport top margin, y=40.0
    assert(doc.contains(",40.0"))
    val noLegend = Render.svg(fetched, "average", Render.SvgOptions(
      hideLegend = true)).head.getString(0)
    assert(!noLegend.contains("<text"))
  }

  test("svg option overrides: lineMode, drawNullAs, bgcolor, vtitle") {
    val fetched = Fetch.fetch(spark, metrics, "a.*", spec, "average", 0.0,
      0L, 120L, 200L)
    // average mode normally connects with null gaps; override to
    // staircase + hold: a.x gains the held t=120 point plus 2 step dups
    val doc = Render.svg(fetched, "average", Render.SvgOptions(
      lineMode = Some("staircase"), drawNullAs = Some("hold"),
      bgcolor = Some("#fff"), vtitle = Some("load & temp"),
      hideLegend = true)).head.getString(0)
    assert(doc.contains("""<rect width="100%" height="100%" fill="#fff"/>"""))
    assert(doc.contains("rotate(-90)") && doc.contains("load &amp; temp"))
    val re = ("""points="([^"]*)"><title>a.x""").r
    val n = """\d+\.\d,\d+\.\d""".r
      .findAllIn(re.findFirstMatchIn(doc).get.group(1)).size
    assert(n == 5, s"expected 5 coordinate pairs, got $n")
  }

  test("lineMode=slope breaks the polyline at null periods, connected bridges them") {
    // a.x has a null 1m bucket between two points → slope = 2 segments
    val gappy = Seq(("a.x", 0L, 1.0), ("a.x", 120L, 3.0)).toDF("path", "ts", "value")
    val fetched = Fetch.fetch(spark, gappy, "a.*", spec, "average", 0.0,
      0L, 120L, 200L)
    val slope = Render.svg(fetched, "average", Render.SvgOptions(
      lineMode = Some("slope"), hideLegend = true)).head.getString(0)
    assert("<polyline ".r.findAllIn(slope).size == 2)
    val conn = Render.svg(fetched, "average", Render.SvgOptions(
      hideLegend = true)).head.getString(0)
    assert("<polyline ".r.findAllIn(conn).size == 1)
    // legend still lists the path once even when segmented
    val withLegend = Render.svg(fetched, "average", Render.SvgOptions(
      lineMode = Some("slope"))).head.getString(0)
    assert("■ a\\.x".r.findAllIn(withLegend).size == 1)
  }

  test("graphType override beats areaMode-derived chart type (L_DataGraph.lua:278)") {
    val fetched = Fetch.fetch(spark, metrics, "a.*", spec, "average", 0.0,
      0L, 120L, 200L)
    // areaMode=none but graphType=AreaChart → area polygon forced
    val forced = Render.svg(fetched, "average", Render.SvgOptions(
      graphType = Some("AreaChart"))).head.getString(0)
    assert(forced.contains("<polygon"))
    // areaMode=all but graphType=LineChart → area polygon suppressed
    val suppressed = Render.svg(fetched, "average", Render.SvgOptions(
      areaMode = "all", graphType = Some("LineChart"))).head.getString(0)
    assert(!suppressed.contains("<polygon"))
    // no graphType: areaMode decides (existing default)
    val derived = Render.svg(fetched, "average", Render.SvgOptions(
      areaMode = "all")).head.getString(0)
    assert(derived.contains("<polygon"))
  }

  test("treejson/completer serialized documents and jsonp wrap") {
    val paths = Seq("a.x", "a.x.v").toDF("path")
    val tjDocs = Render.treejson(Api.findFormat(paths, "a.*"))
      .collect().map(_.getString(0))
    assert(tjDocs.contains(
      """{"allowChildren":1,"context":{},"expandable":1,"id":"a.x","leaf":0,"text":"x"}"""))
    assert(tjDocs.contains(
      """{"allowChildren":0,"context":{},"expandable":0,"id":"a.x","leaf":1,"text":"x"}"""))
    val cpDoc = Render.completer(Api.findFormat(paths, "a.*", "completer"))
      .collect().map(_.getString(0))
    assert(cpDoc.length == 1 && cpDoc(0) ==
      """{"metrics":[{"is_leaf":0,"name":"x","path":"a.x."},{"is_leaf":1,"name":"x","path":"a.x"}]}""")
    val wrapped = Render.jsonp(Render.completer(
      Api.findFormat(paths, "a.*", "completer")), "cb").collect()
    assert(wrapped(0).getString(0).startsWith("cb({") && wrapped(0).getString(0).endsWith(")"))
  }
}
