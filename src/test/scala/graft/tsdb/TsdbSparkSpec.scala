package graft.tsdb

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DataFrame-level specs for the Whisper/Carbon/Graphite/dataMine
  * operators on tiny in-memory inputs with hand-computed expectations.
  */
class TsdbSparkSpec extends SparkSpec {
  import spark.implicits._

  def metrics = Seq(
    ("a.x.v", 0L, 1.0), ("a.x.v", 30L, 3.0), ("a.x.v", 60L, 5.0),
    ("a.x.v", 130L, 7.0), ("a.y.v", 10L, 10.0), ("b.z", 65L, 2.0)
  ).toDF("path", "ts", "value")

  test("rollup methods (B1-B5)") {
    def roll(m: String) =
      Rollup.rollup(metrics, 60L, m)
        .orderBy("path", "bucket")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(roll("average") == Seq(
      ("a.x.v", 0L, 2.0, 2L), ("a.x.v", 60L, 5.0, 1L), ("a.x.v", 120L, 7.0, 1L),
      ("a.y.v", 0L, 10.0, 1L), ("b.z", 60L, 2.0, 1L)))
    assert(roll("sum").head == ("a.x.v", 0L, 4.0, 2L))
    assert(roll("last").head == ("a.x.v", 0L, 3.0, 2L))
    assert(roll("max").head == ("a.x.v", 0L, 3.0, 2L))
    assert(roll("min").head == ("a.x.v", 0L, 1.0, 2L))
  }

  test("xFilesFactor gates propagation (B6)") {
    val fine = Rollup.rollup(metrics.filter($"path" === "a.x.v"), 60L, "average")
    // 3 of 2 expected... bucket 0 of step 120 has slots {0,60} = 2/2,
    // bucket 120 has {120} = 1/2
    val strict = Rollup.propagate(fine, 60L, 120L, "average", 1.0)
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(strict.toSeq == Seq((0L, 3.5))) // avg(avg(1,3), avg(5)) = avg(2,5)
    val loose = Rollup.propagate(fine, 60L, 120L, "average", 0.5)
      .orderBy("bucket").collect().map(r => r.getLong(1))
    assert(loose.toSeq == Seq(0L, 120L))
  }

  test("upsert: incoming slot writes override stored points (B11)") {
    val existing = Seq(("a", 10L, 1.0), ("a", 20L, 2.0)).toDF("path", "ts", "value")
    val incoming = Seq(("a", 10L, 9.0), ("a", 30L, 3.0)).toDF("path", "ts", "value")
    val out = Rollup.upsert(existing, incoming)
      .orderBy("path", "ts").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((10L, 9.0), (20L, 2.0), (30L, 3.0)))
  }

  test("fetch returns a dense null-gapped grid (B8)") {
    val spec = Retention.parse("1m:1h,10m:6h")
    val out = Fetch.fetch(spark, metrics, "a.*.v", spec, "average", 0.0,
      0L, 180L, 200L)
      .orderBy("path", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    // 1m archive selected; grid 0,60,120,180 per path
    assert(out.toSeq == Seq(
      ("a.x.v", 0L, 2.0), ("a.x.v", 60L, 5.0), ("a.x.v", 120L, 7.0), ("a.x.v", 180L, null),
      ("a.y.v", 0L, 10.0), ("a.y.v", 60L, null), ("a.y.v", 120L, null), ("a.y.v", 180L, null)))
  }

  test("gap policy follows the aggregation method (L_DataGraph.lua:172-173)") {
    assert(Fetch.gapPolicy("average") == "null")
    assert(Fetch.gapPolicy("sum") == "zero")
    assert(Seq("last", "max", "min").forall(Fetch.gapPolicy(_) == "hold"))
    assert(Fetch.drawMode("average") == "connected")
    assert(Fetch.drawMode("sum") == "staircase")
    val spec = Retention.parse("1m:1h,10m:6h")
    // fetch returns RAW nulls (csv/json semantics, graphite_cgi.lua:
    // 316-370); the method-derived fill is applied at svg-render time
    def vals(method: String, fill: Boolean): Seq[Any] = {
      val raw = Fetch.fetch(spark, metrics, "a.*.v", spec, method, 0.0, 0L, 180L, 200L)
      val d = if (fill) Fetch.fillGaps(raw, Fetch.gapPolicy(method)) else raw
      d.orderBy("path", "t").collect()
        .map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq
    }
    // a.y.v has one point (t=0) then gaps: raw fetch leaves them null
    assert(vals("sum", fill = false).drop(4) == Seq(10.0, null, null, null))
    assert(vals("last", fill = false).drop(4) == Seq(10.0, null, null, null))
    // render-time fill: sum → zeros, last → held value, average → null
    assert(vals("sum", fill = true).drop(4) == Seq(10.0, 0.0, 0.0, 0.0))
    assert(vals("last", fill = true).drop(4) == Seq(10.0, 10.0, 10.0, 10.0))
    assert(vals("average", fill = true).drop(4) == Seq(10.0, null, null, null))
  }

  test("fetch archive selection falls to coarser archive (B8)") {
    val spec = Retention.parse("1m:1h,10m:6h")
    // from is older than the 1m archive's retention (3600s) → 10m archive
    val now = 7200L
    val sel = Fetch.select(spec, 100L, now, now)
    assert(sel.get.archive.secondsPerPoint == 600L)
    // entirely-future window → None
    assert(Fetch.select(spec, now + 100, now + 200, now).isEmpty)
  }

  test("metric tree find/expand/index (C1-C3)") {
    val paths = metrics.select("path").distinct()
    val find = MetricTree.find(paths, "a.*")
      .orderBy("path", "is_leaf").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(find.toSeq == Seq(("a.x", "x", 0L), ("a.y", "y", 0L)))
    val leaves = MetricTree.find(paths, "*.*.v")
      .orderBy("path").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(leaves.toSeq == Seq(("a.x.v", 1L), ("a.y.v", 1L)))
    val exp = MetricTree.expand(paths, "a.*", leavesOnly = false)
      .orderBy("path").collect().map(_.getString(0))
    assert(exp.toSeq == Seq("a.x.", "a.y."))
    assert(MetricTree.index(paths).collect().map(_.getString(0)).toSeq ==
      Seq("a.x.v", "a.y.v", "b.z"))
  }

  test("a node can be both leaf and branch (C1)") {
    val paths = Seq("a.x", "a.x.deep").toDF("path")
    val find = MetricTree.find(paths, "a.*")
      .orderBy("path", "is_leaf").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(find.toSeq == Seq(("a.x", 0L), ("a.x", 1L)))
  }

  test("carbon parse handles missing timestamps (A1)") {
    val lines = Seq("a.b 1.5 100", "c.d 2", "bogus", "e.f nan 3").toDF("line")
    val out = Carbon.parse(lines, 999L)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // "bogus" (no value) is dropped; "nan" casts to NaN (valid double)
    assert(out.length == 3)
    assert(out(0) == ("a.b", 1.5, 100L))
    assert(out(1) == ("c.d", 2.0, 999L))
    assert(out(2)._1 == "e.f" && out(2)._2.isNaN)
  }

  test("carbon rewrite is first-match-only per pass (A2)") {
    val rules = Seq(Carbon.Rule("^a\\.", "A."), Carbon.Rule("^A\\.", "ZZZ."))
    val out = Seq("a.b", "x.y").toDF("p")
      .select(Carbon.rewrite(col("p"), rules).as("p"))
      .orderBy("p").collect().map(_.getString(0))
    // first rule matched a.b → A.b; second rule NOT applied after a match
    assert(out.toSeq == Seq("A.b", "x.y"))
  }

  test("carbon rewrite substitutes only the FIRST occurrence (gsub count=1)") {
    // the reference is gsub(pattern, repl, 1) (L_DataCache.lua:125):
    // an unanchored rule must not rewrite every occurrence
    val out = Seq("a_b_c").toDF("p")
      .select(Carbon.rewrite(col("p"), Seq(Carbon.Rule("_", "."))).as("p"))
      .head.getString(0)
    assert(out == "a.b_c")
  }

  test("translation routing: a partial wildcard beats the bare '*' section") {
    val tables = Map(
      "*.srv.Var" -> Map("On" -> "1"),
      "1*.srv.Var" -> Map("On" -> "100"))
    val out = Seq(("12.srv.Var", "On"), ("7.srv.Var", "On")).toDF("tag", "sym")
      .select(col("tag"), Carbon.translateRouted(col("tag"), col("sym"), tables).as("code"))
      .orderBy("tag").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("12.srv.Var", "100"), ("7.srv.Var", "1")))
  }

  test("gridTimes n=1 returns the start time, not NaN->0") {
    assert(Datamine.gridTimes(1000L, 2000L, 1) == Seq(1000L))
  }

  test("datamine resample: last sample ≤ grid time (D1)") {
    val pts = Seq((10L, 1.0), (10L, 0.5), (25L, 2.0)).toDF("ts", "value")
    val out = Datamine.resample(pts, Seq(0L, 10L, 20L, 30L))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    // dup ts=10 deduped to max=1.0; t=0 precedes first sample → null
    assert(out.toSeq == Seq((0L, null), (10L, 1.0), (20L, 1.0), (30L, 2.0)))
  }

  test("datamine filter: offset then clamp, nulls untouched (D1)") {
    val out = Datamine.filter(
      Seq(Some(1.0), Some(5.0), Some(9.0), None).toDF("value"), 1.0, 3.0, 8.0)
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    // greatest/least skip nulls, so without the guard None would clamp
    // to the lower bound instead of surviving as null
    assert(out.toSeq == Seq(3.0, 6.0, 8.0, null))
  }

  test("render json datapoint arrays are ordered (C6)") {
    val fetched = Seq(("p", 60L, Some(2.0)), ("p", 0L, Some(1.0)), ("p", 120L, None))
      .toDF("path", "t", "value")
    val out = Render.json(fetched).collect()
    assert(out.length == 1)
    val js = out(0).getString(1)
    // the reference's Render-API document (graphite_cgi.lua:340-371):
    // [value, ts] pairs in time order, gaps as null, 4-dp scale-padded
    assert(js == """[[1.0000, 0], [2.0000, 60], [null, 120]]""")
  }
}
