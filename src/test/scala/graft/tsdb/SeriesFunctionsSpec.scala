package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tsdb.TargetExpr._

/** C9 render-function pipeline: parser/AST round trips, evaluator
  * dispatch, and the null semantics of the functions the driver
  * oracles don't individually pin (perSecond, keepLastValue,
  * countSeries, group, timeShift, negative aliasByNode indices).
  */
class SeriesFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, Long, java.lang.Double)*): DataFrame =
    rows.toDF("path", "t", "value")

  private def vals(df: DataFrame): Seq[(String, Long, Option[Double])] =
    df.orderBy("path", "t").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))

  test("parser: nested calls, quoted strings, numbers, globs") {
    val e = parse("""summarize(sumSeries(vera.u1?.click), '1hour', "avg")""")
    assert(e == CallExpr("summarize", Seq(
      SeriesArg(CallExpr("sumSeries", Seq(SeriesArg(PathExpr("vera.u1?.click"))))),
      StrArg("1hour"), StrArg("avg"))))
    assert(render(e) == """summarize(sumSeries(vera.u1?.click),"1hour","avg")""")
    // numbers: ints render without .0, negatives and floats survive
    assert(parse("scale(a.b,-1.5)") ==
      CallExpr("scale", Seq(SeriesArg(PathExpr("a.b")), NumArg(-1.5))))
    assert(render(parse("scale(a.b,2)")) == "scale(a.b,2)")
    // a leading-digit glob is a path, not a number
    assert(parse("sumSeries(1min.cpu.*)") ==
      CallExpr("sumSeries", Seq(SeriesArg(PathExpr("1min.cpu.*")))))
    // bools parse as keywords
    assert(parse("f(a.b,true,false)") == CallExpr("f",
      Seq(SeriesArg(PathExpr("a.b")), BoolArg(true), BoolArg(false))))
    // braces/brackets ride the path token
    assert(parse("sum(vera.u{1,2}.click)") ==
      CallExpr("sum", Seq(SeriesArg(PathExpr("vera.u{1,2}.click")))))
  }

  test("parser: loud failures on malformed targets and bad arguments") {
    intercept[IllegalArgumentException](parse("sumSeries(a.b"))
    intercept[IllegalArgumentException](parse("sumSeries(a.b))"))
    intercept[IllegalArgumentException](parse("alias(a.b,'unterminated"))
    intercept[IllegalArgumentException](parse(""))
    val fetch = (_: String) => frame(("x", 0L, 1.0))
    intercept[IllegalArgumentException](evalTarget("noSuchFunction(a.b)", fetch))
    intercept[IllegalArgumentException](evalTarget("alias(a.b,5)", fetch)) // number where string
    intercept[IllegalArgumentException](evalTarget("scale(a.b)", fetch)) // arity
    intercept[IllegalArgumentException](evalTarget("movingAverage(a.b,2.5)", fetch)) // non-integer n
  }

  test("combine: all-null timestamps stay null; countSeries counts non-null values") {
    val f = frame(("a", 0L, 1.0), ("a", 60L, null), ("a", 120L, 2.0),
      ("b", 0L, 3.0), ("b", 60L, null), ("b", 120L, null))
    assert(vals(SeriesFunctions.sumSeries(f, "s")) ==
      Seq(("s", 0L, Some(4.0)), ("s", 60L, None), ("s", 120L, Some(2.0))))
    assert(vals(SeriesFunctions.combine(f, "count", "c")) ==
      Seq(("c", 0L, Some(2.0)), ("c", 60L, Some(0.0)), ("c", 120L, Some(1.0))))
  }

  test("perSecond: delta over grid step, wraps and gaps null") {
    val f = frame(("a", 0L, 10.0), ("a", 60L, 130.0), ("a", 120L, 10.0),
      ("a", 180L, null), ("a", 240L, 70.0))
    assert(vals(SeriesFunctions.perSecond(f)) == Seq(
      ("perSecond(a)", 0L, None),       // no predecessor
      ("perSecond(a)", 60L, Some(2.0)), // (130-10)/60
      ("perSecond(a)", 120L, None),     // counter wrap (negative)
      ("perSecond(a)", 180L, None),     // gap
      ("perSecond(a)", 240L, None)))    // predecessor is a gap
  }

  test("keepLastValue holds across gaps; leading gaps stay null") {
    val f = frame(("a", 0L, null), ("a", 60L, 5.0), ("a", 120L, null), ("a", 180L, null))
    assert(vals(SeriesFunctions.keepLastValue(f)) == Seq(
      ("keepLastValue(a)", 0L, None), ("keepLastValue(a)", 60L, Some(5.0)),
      ("keepLastValue(a)", 120L, Some(5.0)), ("keepLastValue(a)", 180L, Some(5.0))))
  }

  test("timeShift refetches the shifted window and relabels onto the render grid") {
    // the frame-level combinator is a pure relabel
    val f = frame(("a", 3600L, 1.0))
    assert(vals(SeriesFunctions.timeShift(f, -3600L, "1h")) ==
      Seq(("""timeShift(a,"1h")""", 0L, Some(1.0))))
    // window-aware evaluation: fetchAt encodes the requested shift in
    // both the timestamp and the value, so the assertions pin that the
    // subtree fetched the SHIFTED window and its points came back onto
    // the render grid (graphite: "1d" draws yesterday's data at
    // today's timestamps)
    val fetchAt = (_: String, shift: Long) => frame(("a", 3600L + shift, shift.toDouble))
    val back = vals(TargetExpr.evalAt(parse("timeShift(a,'1h')"), fetchAt, 0L))
    assert(back == Seq(("""timeShift(a,"1h")""", 3600L, Some(-3600.0))))
    val fwd = vals(TargetExpr.evalAt(parse("timeShift(a,'+1h')"), fetchAt, 0L))
    assert(fwd == Seq(("""timeShift(a,"+1h")""", 3600L, Some(3600.0))))
    // nested shifts accumulate in the fetch and unwind in the relabel
    val nest = vals(TargetExpr.evalAt(
      parse("timeShift(timeShift(a,'1h'),'1h')"), fetchAt, 0L))
    assert(nest == Seq(
      ("""timeShift(timeShift(a,"1h"),"1h")""", 3600L, Some(-7200.0))))
  }

  test("timeStack: shifted instances refetch their windows; smartSummarize aligns to window start") {
    // timeStack(a,'1h',0,2): three instances shifted 0/-1h/-2h, each
    // fetching ITS window (value encodes the shift) and relabeling
    // back onto the render grid
    val fetchAt = (_: String, shift: Long) => frame(("a", 3600L + shift, shift.toDouble))
    val stack = vals(TargetExpr.evalAt(parse("timeStack(a,'1h',0,2)"), fetchAt, 0L))
    assert(stack == Seq(
      ("""timeShift(a,"1h,0")""", 3600L, Some(0.0)),
      ("""timeShift(a,"1h,1")""", 3600L, Some(-3600.0)),
      ("""timeShift(a,"1h,2")""", 3600L, Some(-7200.0))))
    // smartSummarize: buckets start at the series' own min t (100),
    // not the epoch grid — summarize at the same interval differs
    val f = frame(("a", 100L, 1.0), ("a", 160L, 5.0),
      ("a", 220L, 2.0), ("a", 280L, 7.0))
    assert(vals(SeriesFunctions.smartSummarize(f, 120L, "max", "2min")) ==
      Seq(("""smartSummarize(a, "2min", "max")""", 100L, Some(5.0)),
        ("""smartSummarize(a, "2min", "max")""", 220L, Some(7.0))))
    assert(vals(SeriesFunctions.summarize(f, 120L, "max", "2min")).map(_._2) ==
      Seq(0L, 120L, 240L)) // epoch-aligned buckets split the same points 3 ways
  }

  test("aliasByNode: negative indices count from the end, group unions") {
    val f = frame(("vera.u7.click", 0L, 1.0))
    assert(vals(SeriesFunctions.aliasByNode(f, Seq(-1, 0))) ==
      Seq(("click.vera", 0L, Some(1.0))))
    val g = evalTarget("group(alias(a.b,'x'),alias(a.b,'y'))", (_: String) => f)
    assert(vals(g).map(_._1).sorted == Seq("x", "y"))
  }

  test("summarize last: latest non-null point per bucket; empty bucket null") {
    val f = frame(("a", 0L, 1.0), ("a", 60L, 2.0), ("a", 120L, null),
      ("a", 240L, null), ("a", 300L, null))
    assert(vals(SeriesFunctions.summarize(f, 240L, "last", "4min")) == Seq(
      ("""summarize(a, "4min", "last")""", 0L, Some(2.0)),
      ("""summarize(a, "4min", "last")""", 240L, None)))
  }

  test("parseInterval: graphite unit spellings") {
    import SeriesFunctions.parseInterval
    assert(parseInterval("1hour") == 3600L)
    assert(parseInterval("30min") == 1800L)
    assert(parseInterval("10s") == 10L)
    assert(parseInterval("2d") == 172800L)
    assert(parseInterval("1week") == 604800L)
    assert(parseInterval("90") == 90L)
    intercept[IllegalArgumentException](parseInterval("1fortnight"))
  }

  test("divideSeries: zero and absent divisor points null; multi-series divisor collapses") {
    val a = frame(("a", 0L, 10.0), ("a", 60L, 6.0), ("a", 120L, 5.0), ("a", 180L, 1.0))
    val b = frame(("b1", 0L, 2.0), ("b1", 60L, 0.0), ("b1", 120L, null),
      ("b2", 0L, 3.0), ("b2", 60L, 0.0), ("b2", 120L, null))
    // divisor collapses to safeSum: t0=5, t60=0 (→null), t120 all-null
    // (→null), t180 absent from divisor (→null); per-dividend naming
    // wraps the dividend path around the divisor's call text
    assert(vals(SeriesFunctions.divideSeries(a, b, "d")) == Seq(
      ("divideSeries(a,d)", 0L, Some(2.0)), ("divideSeries(a,d)", 60L, None),
      ("divideSeries(a,d)", 120L, None), ("divideSeries(a,d)", 180L, None)))
  }

  test("divideSeries: a multi-series dividend yields one named ratio per input") {
    val a = frame(("a1", 0L, 10.0), ("a2", 0L, 4.0))
    val b = frame(("b", 0L, 2.0))
    assert(vals(SeriesFunctions.divideSeries(a, b, "b")) == Seq(
      ("divideSeries(a1,b)", 0L, Some(5.0)), ("divideSeries(a2,b)", 0L, Some(2.0))))
  }

  test("asPercent 2-arg: constant total is map-only scaling; series total joins on t") {
    val f = frame(("a", 0L, 30.0), ("a", 60L, null))
    assert(vals(SeriesFunctions.asPercentConst(f, 120)) == Seq(
      ("asPercent(a,120)", 0L, Some(25.0)), ("asPercent(a,120)", 60L, None)))
    intercept[IllegalArgumentException](SeriesFunctions.asPercentConst(f, 0))
    val tot = frame(("t1", 0L, 60.0), ("t2", 0L, 60.0), ("t1", 60L, 0.0))
    assert(vals(SeriesFunctions.asPercentOf(f, tot, "x.*")) == Seq(
      ("asPercent(a,x.*)", 0L, Some(25.0)), // 30*100/(60+60)
      ("asPercent(a,x.*)", 60L, None)))     // zero total
  }

  test("nPercentile: discrete selection, flat line, all-null series stay null") {
    // 9 non-null values 1..9 → p50 rank = floor(.5*10)=5 → value 5;
    // p90 rank = floor(.9*10)=9 → value 9; p1 rank = max(1, 0) = 1
    val rows = (1 to 9).map(i => ("a", i * 60L, java.lang.Double.valueOf(i))) :+
      (("a", 600L, null: java.lang.Double)) :+ (("z", 0L, null: java.lang.Double))
    val f = frame(rows: _*)
    val p50 = vals(SeriesFunctions.nPercentile(f, 50))
    assert(p50.filter(_._1 == "nPercentile(a,50)").forall(_._3 == Some(5.0)))
    assert(p50.filter(_._1 == "nPercentile(z,50)").forall(_._3.isEmpty))
    val p90 = vals(SeriesFunctions.nPercentile(f, 90))
    assert(p90.filter(_._1 == "nPercentile(a,90)").forall(_._3 == Some(9.0)))
    val p1 = vals(SeriesFunctions.nPercentile(f, 1))
    assert(p1.filter(_._1 == "nPercentile(a,1)").forall(_._3 == Some(1.0)))
  }

  test("stdev: trailing-window population stddev, nulls ignored, all-null window null") {
    val f = frame(("a", 0L, 2.0), ("a", 60L, 4.0), ("a", 120L, null),
      ("a", 180L, 6.0), ("b", 0L, null))
    val out = vals(SeriesFunctions.stdev(f, 3))
    // t0: {2} → 0; t60: {2,4} → 1; t120: {2,4} → 1; t180: {4,6} → 1
    assert(out == Seq(
      ("stdev(a,3)", 0L, Some(0.0)), ("stdev(a,3)", 60L, Some(1.0)),
      ("stdev(a,3)", 120L, Some(1.0)), ("stdev(a,3)", 180L, Some(1.0)),
      ("stdev(b,3)", 0L, None)))
  }

  test("lowest / mostDeviant / currentBelow / aliasSub select and relabel") {
    val f = frame(("a", 0L, 1.0), ("a", 60L, 1.0),    // mean 1, var 0, cur 1
      ("b", 0L, 0.0), ("b", 60L, 10.0),               // mean 5, var 25, cur 10
      ("c", 0L, 4.0), ("c", 60L, 2.0),                // mean 3, var 1, cur 2
      ("z", 0L, null), ("z", 60L, null))              // all-gap: nulls last
    def paths(df: DataFrame) = vals(df).map(_._1).distinct.sorted
    assert(paths(SeriesFunctions.lowestAverage(f, 2)) == Seq("a", "c"))
    assert(paths(SeriesFunctions.lowestCurrent(f, 2)) == Seq("a", "c"))
    // an all-gap series never wins "lowest"
    assert(!paths(SeriesFunctions.lowestAverage(f, 3)).contains("z"))
    assert(paths(SeriesFunctions.mostDeviant(f, 2)) == Seq("b", "c"))
    // currentBelow through the evaluator (filterByStat plumbing)
    val fetch = (_: String) => f
    assert(paths(evalTarget("currentBelow(x.*,5)", fetch)) == Seq("a", "c"))
    // aliasSub: regex relabel, map-only
    assert(vals(SeriesFunctions.aliasSub(f.filter(col("path") === "a"), "^a$", "alpha"))
      .map(_._1).distinct == Seq("alpha"))
  }

  test("groupByNode / aliasByMetric / integralByInterval / hitcount semantics") {
    val f = frame(("dc1.hostA.cpu", 0L, 1.0), ("dc1.hostB.cpu", 0L, 2.0),
      ("dc2.hostC.cpu", 0L, 4.0), ("dc1.hostA.cpu", 60L, null),
      ("dc1.hostB.cpu", 60L, null), ("dc2.hostC.cpu", 60L, 8.0))
    // groupByNode(0, sum): per-dc totals; all-null group point stays null
    assert(vals(SeriesFunctions.groupByNode(f, 0, "sumSeries")) == Seq(
      ("dc1", 0L, Some(3.0)), ("dc1", 60L, None),
      ("dc2", 0L, Some(4.0)), ("dc2", 60L, Some(8.0))))
    // negative node counts from the end
    assert(vals(SeriesFunctions.groupByNode(f, -2, "maxSeries"))
      .map(_._1).distinct.sorted == Seq("hostA", "hostB", "hostC"))
    // aliasByMetric: last node, map-only
    assert(vals(SeriesFunctions.aliasByMetric(f)).map(_._1).distinct == Seq("cpu"))
    // integralByInterval: the running total RESETS at the boundary
    val g = frame(("a", 0L, 1.0), ("a", 60L, 2.0), ("a", 120L, 3.0), ("a", 180L, 4.0))
    assert(vals(SeriesFunctions.integralByInterval(g, 120L, "2min")).map(_._3) ==
      Seq(Some(1.0), Some(3.0), Some(3.0), Some(7.0)))
    // hitcount: value × derived step per bucket; the first point has
    // no step and contributes nothing; an all-null bucket is null
    val h = frame(("a", 0L, 5.0), ("a", 60L, 5.0), ("a", 120L, 1.0),
      ("a", 180L, null), ("a", 240L, null))
    assert(vals(SeriesFunctions.hitcount(h, 120L, "2min")) == Seq(
      ("hitcount(a, \"2min\")", 0L, Some(300.0)),   // t60: 5*60 (t0 no step)
      ("hitcount(a, \"2min\")", 120L, Some(60.0)),  // t120: 1*60; t180 null
      ("hitcount(a, \"2min\")", 240L, None)))       // all-null bucket
  }

  test("ema / linearRegression / range-stddev combiners") {
    // ema(3): α = 0.5 — hand-checkable halving recurrence; nulls skip
    // without touching the state, leading state seeds from the first
    // non-null
    val f = frame(("a", 0L, null), ("a", 60L, 4.0), ("a", 120L, null),
      ("a", 180L, 8.0), ("a", 240L, 2.0))
    assert(vals(SeriesFunctions.exponentialMovingAverage(f, 3)) == Seq(
      ("exponentialMovingAverage(a,3)", 0L, None),
      ("exponentialMovingAverage(a,3)", 60L, Some(4.0)),   // seed
      ("exponentialMovingAverage(a,3)", 120L, None),       // gap: state held
      ("exponentialMovingAverage(a,3)", 180L, Some(6.0)),  // .5*8 + .5*4
      ("exponentialMovingAverage(a,3)", 240L, Some(4.0)))) // .5*2 + .5*6
    // linearRegression: exact line y = 1 + 0.01*t reproduced at every
    // grid point INCLUDING the gap; <2 points → no line
    val g = frame(("a", 0L, 1.0), ("a", 100L, 2.0), ("a", 200L, null),
      ("a", 300L, 4.0), ("b", 0L, 7.0), ("b", 100L, null))
    val lr = vals(SeriesFunctions.linearRegression(g))
    assert(lr.filter(_._1 == "linearRegression(a)").map(_._3) ==
      Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0)))
    assert(lr.filter(_._1 == "linearRegression(b)").forall(_._3.isEmpty))
    // rangeOfSeries / stddevSeries across series per t
    val h = frame(("x", 0L, 2.0), ("y", 0L, 6.0), ("x", 60L, null), ("y", 60L, null))
    assert(vals(SeriesFunctions.combine(h, "range", "r")) ==
      Seq(("r", 0L, Some(4.0)), ("r", 60L, None)))
    assert(vals(SeriesFunctions.combine(h, "stddev", "s")) ==
      Seq(("s", 0L, Some(2.0)), ("s", 60L, None)))
  }

  test("movingMedian / weightedAverage semantics") {
    // movingMedian(3): spike at t=120 cannot drag the median the way
    // it drags movingAverage; all-null window null
    val f = frame(("a", 0L, 1.0), ("a", 60L, 2.0), ("a", 120L, 100.0),
      ("a", 180L, 3.0), ("a", 240L, null), ("b", 0L, null))
    assert(vals(SeriesFunctions.movingMedian(f, 3)) == Seq(
      ("movingMedian(a,3)", 0L, Some(1.0)),    // {1}
      ("movingMedian(a,3)", 60L, Some(1.0)),   // {1,2} → lower middle
      ("movingMedian(a,3)", 120L, Some(2.0)),  // {1,2,100}
      ("movingMedian(a,3)", 180L, Some(3.0)),  // {2,3,100}
      ("movingMedian(a,3)", 240L, Some(3.0)),  // {3,100} → lower middle
      ("movingMedian(b,3)", 0L, None)))
    // weightedAverage matched on node 1: Σ a·w / Σ w; a missing value
    // side removes its weight from the denominator; zero mass → null
    val a = frame(("x.h1.lat", 0L, 10.0), ("x.h2.lat", 0L, 20.0),
      ("x.h1.lat", 60L, null), ("x.h2.lat", 60L, 30.0),
      ("x.h1.lat", 120L, 5.0), ("x.h2.lat", 120L, 5.0))
    val w = frame(("x.h1.qps", 0L, 3.0), ("x.h2.qps", 0L, 1.0),
      ("x.h1.qps", 60L, 9.0), ("x.h2.qps", 60L, 1.0),
      ("x.h1.qps", 120L, 0.0), ("x.h2.qps", 120L, 0.0))
    assert(vals(SeriesFunctions.weightedAverage(a, w, 1, "wa")) == Seq(
      ("wa", 0L, Some(12.5)),  // (10·3 + 20·1)/(3+1)
      ("wa", 60L, Some(30.0)), // h1 value missing → its 9.0 weight drops
      ("wa", 120L, None)))     // zero weight mass
  }

  test("holtWintersForecast: seed, gap-hold, ring update vs a scala model") {
    val vals0: Seq[Option[Double]] = Seq(Some(10.0), Some(12.0), None,
      Some(14.0), Some(11.0), Some(13.0), Some(15.0), Some(12.0))
    val f = frame(vals0.zipWithIndex.map { case (v, i) =>
      ("a", i * 60L, v.map(Double.box).map(_.asInstanceOf[java.lang.Double]).orNull) }: _*)
    val L = 3
    // independent replay of the documented rules
    val (a, b, g) = (0.1, 0.0035, 0.1)
    var lvl: Option[Double] = None; var trd = 0.0
    val season = Array.fill(L)(0.0)
    val expect = vals0.zipWithIndex.map { case (vo, i) =>
      val k = i % L
      val fc = lvl.map(l => l + trd + season(k))
      vo.foreach { v =>
        lvl match {
          case None => lvl = Some(v)
          case Some(l) =>
            val lN = a * (v - season(k)) + (1 - a) * (l + trd)
            trd = b * (lN - l) + (1 - b) * trd
            season(k) = g * (v - lN) + (1 - g) * season(k)
            lvl = Some(lN)
        }
      }
      fc
    }
    val got = vals(SeriesFunctions.holtWintersForecast(f, L, "3min"))
      .map(_._3)
    assert(got.size == expect.size)
    got.zip(expect).foreach {
      case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9, s"$x vs $y")
      case (None, None) =>
      case (x, y) => fail(s"$x vs $y")
    }
  }

  test("holtWinters bands/aberration: deviation ring vs the same scala model") {
    val vals0: Seq[Option[Double]] = Seq(Some(10.0), Some(12.0), None,
      Some(14.0), Some(11.0), Some(13.0), Some(15.0), Some(12.0))
    val f = frame(vals0.zipWithIndex.map { case (v, i) =>
      ("a", i * 60L, v.map(Double.box).map(_.asInstanceOf[java.lang.Double]).orNull) }: _*)
    val L = 3
    val delta = 2.0
    // the forecast model extended with the deviation ring
    val (a, b, g) = (0.1, 0.0035, 0.1)
    var lvl: Option[Double] = None; var trd = 0.0
    val season = Array.fill(L)(0.0)
    val dev = Array.fill(L)(0.0)
    case class Pt(fc: Option[Double], dk: Double, v: Option[Double])
    val model = vals0.zipWithIndex.map { case (vo, i) =>
      val k = i % L
      val fc = lvl.map(l => l + trd + season(k))
      val dk = dev(k)
      vo.foreach { v =>
        lvl match {
          case None => lvl = Some(v)
          case Some(l) =>
            val lN = a * (v - season(k)) + (1 - a) * (l + trd)
            trd = b * (lN - l) + (1 - b) * trd
            season(k) = g * (v - lN) + (1 - g) * season(k)
            dev(k) = g * math.abs(v - fc.get) + (1 - g) * dev(k)
            lvl = Some(lN)
        }
      }
      Pt(fc, dk, vo)
    }
    def close(x: Option[Double], y: Option[Double]): Unit = (x, y) match {
      case (Some(p), Some(q)) => assert(math.abs(p - q) < 1e-9, s"$p vs $q")
      case (None, None) =>
      case other => fail(other.toString)
    }
    val bands = vals(SeriesFunctions.holtWintersConfidenceBands(f, L, delta))
    val lower = bands.filter(_._1.startsWith("holtWintersConfidenceLower"))
    val upper = bands.filter(_._1.startsWith("holtWintersConfidenceUpper"))
    assert(lower.size == model.size && upper.size == model.size)
    model.zipWithIndex.foreach { case (m, i) =>
      close(upper(i)._3, m.fc.map(_ + delta * m.dk))
      close(lower(i)._3, m.fc.map(_ - delta * m.dk))
    }
    // aberration: 0 at gaps and pre-seed, excursion outside the bands
    val ab = vals(SeriesFunctions.holtWintersAberration(f, L, delta))
    assert(ab.size == model.size)
    model.zipWithIndex.foreach { case (m, i) =>
      val expect = (m.v, m.fc) match {
        case (Some(v), Some(fc)) =>
          val (u, l) = (fc + delta * m.dk, fc - delta * m.dk)
          if (v > u) v - u else if (v < l) v - l else 0.0
        case _ => 0.0
      }
      close(ab(i)._3, Some(expect))
    }
    // the forecast projection is untouched by the shared-fit refactor
    val fc0 = vals(SeriesFunctions.holtWintersForecast(f, L, "3min")).map(_._3)
    model.zip(fc0).foreach { case (m, got) => close(got, m.fc) }
  }

  test("pointwise family: null/math rules") {
    val f = frame(("a", 0L, 4.0), ("a", 60L, null), ("a", 120L, 0.0),
      ("a", 180L, -9.0), ("a", 240L, 100.0))
    assert(vals(SeriesFunctions.transformNull(f, 0.0)).map(_._3) ==
      Seq(Some(4.0), Some(0.0), Some(0.0), Some(-9.0), Some(100.0)))
    assert(vals(SeriesFunctions.isNonNull(f)).map(_._3) ==
      Seq(Some(1.0), Some(0.0), Some(1.0), Some(1.0), Some(1.0)))
    // log10: non-positive (0, -9) and gaps null out
    assert(vals(SeriesFunctions.logarithm(f, 10.0)).map(_._3).map(_.map(v => math.rint(v * 1e9) / 1e9)) ==
      Seq(Some(math.rint(math.log10(4.0) * 1e9) / 1e9), None, None, None, Some(2.0)))
    assert(vals(SeriesFunctions.squareRoot(f)).map(_._3) ==
      Seq(Some(2.0), None, Some(0.0), None, Some(10.0)))
    assert(vals(SeriesFunctions.invert(f)).map(_._3) ==
      Seq(Some(0.25), None, None, Some(-1.0 / 9.0), Some(0.01)))
    assert(vals(SeriesFunctions.powSeries(f, 2.0)).map(_._3) ==
      Seq(Some(16.0), None, Some(0.0), Some(81.0), Some(10000.0)))
    // naming carries the argument
    assert(vals(SeriesFunctions.transformNull(f, 0.0)).head._1 == "transformNull(a,0)")
  }

  test("changed/delay/substr: sequence + relabel rules") {
    val f = frame(("x.h1.lat", 0L, 1.0), ("x.h1.lat", 60L, 1.0),
      ("x.h1.lat", 120L, 2.0), ("x.h1.lat", 180L, null), ("x.h1.lat", 240L, 2.0))
    // changed: both points present and unequal → 1; else 0 (incl. head
    // and the null-neighbour positions)
    assert(vals(SeriesFunctions.changed(f)).map(_._3) ==
      Seq(Some(0.0), Some(0.0), Some(1.0), Some(0.0), Some(0.0)))
    // delay(2): head nulls, values shift right by 2 grid steps
    assert(vals(SeriesFunctions.delay(f, 2)).map(_._3) ==
      Seq(None, None, Some(1.0), Some(1.0), Some(2.0)))
    // substr(1,3): node slice; stop 0 = to the end
    assert(vals(SeriesFunctions.substrSeries(f, 1, 3)).head._1 == "h1.lat")
    assert(vals(SeriesFunctions.substrSeries(f, 2, 0)).head._1 == "lat")
  }

  test("diffSeries/multiplySeries/percentileOfSeries: list math rules") {
    val m = frame(("a", 0L, 10.0), ("a", 60L, null), ("a", 120L, 5.0))
    val s = frame(("b", 0L, 3.0), ("b", 60L, 2.0), ("b", 120L, null))
    // missing subtrahend point subtracts 0; missing minuend stays null
    assert(vals(SeriesFunctions.diffSeries(m, s, "b")).map(_._3) ==
      Seq(Some(7.0), None, Some(5.0)))
    assert(vals(SeriesFunctions.diffSeries(m, s, "b")).head._1 == "diffSeries(a,b)")
    // product needs every factor present
    val two = frame(("a", 0L, 3.0), ("b", 0L, 4.0),
      ("a", 60L, 2.0), ("b", 60L, null))
    assert(vals(SeriesFunctions.multiplySeries(two, "mul")).map(_._3) ==
      Seq(Some(12.0), None))
    // percentileOfSeries: across-series discrete pick per t
    val three = frame(("a", 0L, 1.0), ("b", 0L, 9.0), ("c", 0L, 5.0),
      ("a", 60L, null), ("b", 60L, null), ("c", 60L, null))
    assert(vals(SeriesFunctions.percentileOfSeries(three, 50.0, "p")).map(_._3) ==
      Seq(Some(5.0), None))
    // removeAbove/BelowPercentile: the per-series gate
    val g = frame((1 to 10).map(i =>
      ("a", i * 60L, Double.box(i.toDouble * 10))): _*)
    val above = vals(SeriesFunctions.removeAbovePercentile(g, 90.0)).map(_._3)
    // p90 over 10 values: rank ⌊0.9·11⌋ = 9 → 90.0; 100.0 clips
    assert(above == (1 to 10).map(i =>
      if (i * 10 <= 90) Some(i * 10.0) else None))
    val below = vals(SeriesFunctions.removeBelowPercentile(g, 10.0)).map(_._3)
    // p10: rank ⌊0.1·11⌋ = 1 → 10.0; nothing below it
    assert(below == (1 to 10).map(i => Some(i * 10.0)))
  }

  test("randomized frames: window/selection functions match an independent scala model") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows: Seq[(String, Long, Option[Double])] =
        for (p <- Seq("a", "b", "c", "d"); i <- 0 until 20) yield
          (p, i * 60L,
            if (rnd.nextDouble() < 0.2) None
            else Some((rnd.nextInt(2000) - 1000) / 10.0))
      val f = frame(rows.map { case (p, t, v) =>
        (p, t, v.map(Double.box).map(_.asInstanceOf[java.lang.Double]).orNull) }: _*)
      val byPath = rows.groupBy(_._1).map { case (p, rs) =>
        p -> rs.sortBy(_._2).map(_._3) }
      def close(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
        case (Some(x), Some(y)) => math.abs(x - y) < 1e-9
        case (None, None) => true
        case _ => false
      }
      // movingSum(3): trailing 3-row sum over non-nulls, all-null → null
      val msModel = byPath.flatMap { case (p, vs) =>
        vs.indices.map { i =>
          val w = vs.slice(math.max(0, i - 2), i + 1).flatten
          (s"movingSum($p,3)", i * 60L,
            if (w.isEmpty) None else Some(w.sum)) } }.toSeq.sortBy(r => (r._1, r._2))
      val ms = vals(SeriesFunctions.movingSum(f, 3))
      assert(ms.size == msModel.size &&
        ms.zip(msModel).forall { case (x, y) => x._1 == y._1 && x._2 == y._2 && close(x._3, y._3) })
      // stdev(4): population stddev over the trailing non-null window
      val sdModel = byPath.flatMap { case (p, vs) =>
        vs.indices.map { i =>
          val w = vs.slice(math.max(0, i - 3), i + 1).flatten
          val sd = if (w.isEmpty) None else {
            val m = w.sum / w.size
            Some(math.sqrt(math.max(0.0, w.map(x => (x - m) * (x - m)).sum / w.size)))
          }
          (s"stdev($p,4)", i * 60L, sd) } }.toSeq.sortBy(r => (r._1, r._2))
      val sd = vals(SeriesFunctions.stdev(f, 4))
      assert(sd.size == sdModel.size &&
        sd.zip(sdModel).forall { case (x, y) => x._1 == y._1 && x._2 == y._2 &&
          ((x._3.isEmpty && y._3.isEmpty) ||
            math.abs(x._3.get - y._3.get) < 1e-6) })
      // nPercentile(p): the discrete clamped-rank rule
      for (p <- Seq(10.0, 50.0, 100.0)) {
        val pvModel = byPath.map { case (path, vs) =>
          val nn = vs.flatten.sorted
          val pv = if (nn.isEmpty) None else {
            val r = math.max(1L, math.min(nn.size.toLong,
              math.floor(p / 100.0 * (nn.size + 1)).toLong))
            Some(nn((r - 1).toInt))
          }
          path -> pv }
        val got = vals(SeriesFunctions.nPercentile(f, p))
        assert(got.forall { case (name, _, v) =>
          val path = name.stripPrefix("nPercentile(").takeWhile(_ != ',')
          close(v, pvModel(path)) })
        // p=100 is the per-series max
        if (p == 100.0)
          assert(got.forall { case (name, _, v) =>
            val path = name.stripPrefix("nPercentile(").takeWhile(_ != ',')
            close(v, byPath(path).flatten.sorted.lastOption) })
      }
      // mostDeviant(2): top-2 population variances, path tie-break
      val varByPath = byPath.map { case (p, vs) =>
        val nn = vs.flatten
        p -> (if (nn.isEmpty) None else {
          val m = nn.sum / nn.size
          Some(nn.map(x => (x - m) * (x - m)).sum / nn.size) }) }
      val expect = varByPath.toSeq
        .sortBy { case (p, v) => (-v.getOrElse(Double.NegativeInfinity), p) }
        .take(2).map(_._1).sorted
      val mdPaths = vals(SeriesFunctions.mostDeviant(f, 2)).map(_._1).distinct.sorted
      assert(mdPaths == expect, s"mostDeviant $mdPaths vs model $expect")
    }
  }

  test("sortBy* tag series rank; limit consumes it and strips the tag") {
    val f = frame(("a", 0L, 1.0), ("a", 60L, 9.0),   // max 9, sum 10, min 1
      ("b", 0L, 5.0), ("b", 60L, 5.0),               // max 5, sum 10, min 5
      ("c", 0L, 2.0), ("c", 60L, 3.0))               // max 3, sum 5,  min 2
    def ordOf(df: DataFrame): Seq[(String, Int)] =
      df.select(col("path"), col("ord")).distinct()
        .orderBy(col("ord")).collect().toSeq
        .map(r => (r.getString(0), r.getInt(1)))
    assert(ordOf(SeriesFunctions.sortByMaxima(f)) == Seq(("a", 1), ("b", 2), ("c", 3)))
    assert(ordOf(SeriesFunctions.sortByMinima(f)) == Seq(("a", 1), ("c", 2), ("b", 3)))
    // sum ties (a,b at 10) break by path
    assert(ordOf(SeriesFunctions.sortByTotal(f)) == Seq(("a", 1), ("b", 2), ("c", 3)))
    assert(ordOf(SeriesFunctions.sortByName(f)) == Seq(("a", 1), ("b", 2), ("c", 3)))
    // natural mode (r10): digit runs compare numerically — s2 before
    // s10 — while plain mode is lexicographic; reverse flips; padded
    // key collisions ("s02" vs "s2") tie-break on the raw path
    val g = frame(("s2", 0L, 1.0), ("s10", 0L, 1.0), ("s1.x", 0L, 1.0),
      ("s02", 0L, 1.0))
    assert(ordOf(SeriesFunctions.sortByName(g)).map(_._1) ==
      Seq("s02", "s1.x", "s10", "s2"))
    assert(ordOf(SeriesFunctions.sortByName(g, natural = true)).map(_._1) ==
      Seq("s1.x", "s02", "s2", "s10"))
    assert(ordOf(SeriesFunctions.sortByName(g, natural = true,
      reverse = true)).map(_._1) == Seq("s10", "s2", "s02", "s1.x"))
    // the parsed form accepts the bool args
    assert(vals(evalTarget("limit(sortByName(s.*,true),1)", _ =>
      frame(("s.y2", 0L, 1.0), ("s.y10", 0L, 2.0))))
      .map(_._1).distinct == Seq("s.y2"))
    // limit(sortByMinima, 2) keeps the two LOWEST-minimum series and
    // restores the frame contract (no ord column)
    val lim = SeriesFunctions.limitSeries(SeriesFunctions.sortByMinima(f), 2)
    assert(lim.columns.toSeq == Seq("path", "t", "value"))
    assert(vals(lim).map(_._1).distinct == Seq("a", "c"))
    // without a tag, limit falls back to path order
    assert(vals(SeriesFunctions.limitSeries(f, 2)).map(_._1).distinct == Seq("a", "b"))
  }

  test("asPercent: share of group total per timestamp; zero totals null") {
    val f = frame(("a", 0L, 1.0), ("b", 0L, 3.0),
      ("a", 60L, 0.0), ("b", 60L, 0.0), ("a", 120L, null), ("b", 120L, 2.0))
    assert(vals(SeriesFunctions.asPercent(f)) == Seq(
      ("asPercent(a)", 0L, Some(25.0)), ("asPercent(a)", 60L, None),
      ("asPercent(a)", 120L, None),
      ("asPercent(b)", 0L, Some(75.0)), ("asPercent(b)", 60L, None),
      ("asPercent(b)", 120L, Some(100.0))))
  }

  test("filterByStat / grep / exclude / limit select series") {
    val f = frame(("x.a", 0L, 1.0), ("x.a", 60L, 5.0),
      ("x.b", 0L, 10.0), ("x.b", 60L, 2.0),
      ("y.c", 0L, 3.0), ("y.c", 60L, 3.0))
    def paths(df: DataFrame) = vals(df).map(_._1).distinct.sorted
    assert(paths(SeriesFunctions.filterByStat(f, "average", "above", 3.5)) == Seq("x.b"))
    assert(paths(SeriesFunctions.filterByStat(f, "max", "below", 5.5)) == Seq("x.a", "y.c"))
    // current = last non-null: x.a→5, x.b→2, y.c→3
    assert(paths(SeriesFunctions.filterByStat(f, "current", "above", 2.5)) == Seq("x.a", "y.c"))
    assert(paths(SeriesFunctions.grep(f, "^x\\.")) == Seq("x.a", "x.b"))
    assert(paths(SeriesFunctions.exclude(f, "\\.b$")) == Seq("x.a", "y.c"))
    assert(paths(SeriesFunctions.limitSeries(f, 2)) == Seq("x.a", "x.b"))
    // evaluator dispatch for the whole family
    val fetch = (_: String) => f
    assert(paths(evalTarget("limit(exclude(grep(x.*,'^x'),'b$'),1)", fetch)) == Seq("x.a"))
    assert(paths(evalTarget("averageAbove(x.*,3.5)", fetch)) == Seq("x.b"))
  }

  test("clamp/rebase/movingSum: nulls from clamping ignored by the window") {
    val f = frame(("a", 0L, 5.0), ("a", 60L, 20.0), ("a", 120L, 12.0), ("a", 180L, null))
    // removeBelowValue(10): 5 → null; offsetToZero: min of {20,12}=12
    assert(vals(SeriesFunctions.offsetToZero(
      SeriesFunctions.removeBelowValue(f, 10.0))).map(_._3) ==
      Seq(None, Some(8.0), Some(0.0), None))
    // movingSum(2) over the rebased series: windows ignore nulls,
    // all-null windows stay null
    assert(vals(SeriesFunctions.movingSum(SeriesFunctions.offsetToZero(
      SeriesFunctions.removeBelowValue(f, 10.0)), 2)).map(_._3) ==
      Seq(None, Some(8.0), Some(8.0), Some(0.0)))
    assert(vals(SeriesFunctions.removeAboveValue(f, 12.0)).map(_._3) ==
      Seq(Some(5.0), None, Some(12.0), None))
    // evaluator dispatch incl. the graphite-wrapped names
    val out = evalTarget("movingSum(offsetToZero(removeBelowValue(a,10)),2)",
      (_: String) => f)
    assert(vals(out).head._1 == "movingSum(offsetToZero(removeBelowValue(a,10)),2)")
  }

  test("highestCurrent selection keeps whole series, ranked on the rounded stat") {
    val f = frame(("a", 0L, 9.0), ("a", 60L, 1.0),
      ("b", 0L, 0.0), ("b", 60L, 5.0),
      ("c", 0L, 0.0), ("c", 60L, 3.0))
    // current(a)=1, current(b)=5, current(c)=3 → top2 = b, c
    assert(vals(SeriesFunctions.highestCurrent(f, 2)).map(_._1).distinct.sorted ==
      Seq("b", "c"))
  }

  test("movingMin/movingMax: null-ignoring windows, all-null window is null") {
    val f = frame(("a", 0L, 5.0), ("a", 60L, null), ("a", 120L, 2.0), ("a", 180L, 7.0))
    assert(vals(SeriesFunctions.movingMin(f, 2)) == Seq(
      ("movingMin(a,2)", 0L, Some(5.0)), ("movingMin(a,2)", 60L, Some(5.0)),
      ("movingMin(a,2)", 120L, Some(2.0)), ("movingMin(a,2)", 180L, Some(2.0))))
    assert(vals(SeriesFunctions.movingMax(f, 2)) == Seq(
      ("movingMax(a,2)", 0L, Some(5.0)), ("movingMax(a,2)", 60L, Some(5.0)),
      ("movingMax(a,2)", 120L, Some(2.0)), ("movingMax(a,2)", 180L, Some(7.0))))
    // a window with no values at all: single null run at the head
    val g = frame(("b", 0L, null), ("b", 60L, 4.0))
    assert(vals(SeriesFunctions.movingMin(g, 1)) == Seq(
      ("movingMin(b,1)", 0L, None), ("movingMin(b,1)", 60L, Some(4.0))))
  }

  test("interpolate: linear by timestamp inside, edges stay null") {
    val f = frame(("a", 0L, null), ("a", 60L, 10.0), ("a", 120L, null),
      ("a", 180L, null), ("a", 240L, 40.0), ("a", 300L, null))
    assert(vals(SeriesFunctions.interpolate(f)) == Seq(
      ("interpolate(a)", 0L, None),          // no left neighbour
      ("interpolate(a)", 60L, Some(10.0)),
      ("interpolate(a)", 120L, Some(20.0)),  // 10 + 30·(60/180)
      ("interpolate(a)", 180L, Some(30.0)),
      ("interpolate(a)", 240L, Some(40.0)),
      ("interpolate(a)", 300L, None)))       // no right neighbour
  }

  test("timeSlice nulls outside the window; scaleToSeconds uses the series' own step") {
    val f = frame(("a", 0L, 6.0), ("a", 60L, 12.0), ("a", 120L, 18.0))
    assert(vals(SeriesFunctions.timeSlice(f, 60, 120)) == Seq(
      ("timeSlice(a,60,120)", 0L, None),
      ("timeSlice(a,60,120)", 60L, Some(12.0)),
      ("timeSlice(a,60,120)", 120L, Some(18.0))))
    // step = 60s grid → ×(1/60): per-minute counts become per-second
    assert(vals(SeriesFunctions.scaleToSeconds(f, 1)) == Seq(
      ("scaleToSeconds(a,1)", 0L, Some(0.1)),
      ("scaleToSeconds(a,1)", 60L, Some(0.2)),
      ("scaleToSeconds(a,1)", 120L, Some(0.3))))
    // a one-point series has no derivable step → null
    assert(vals(SeriesFunctions.scaleToSeconds(frame(("b", 0L, 5.0)), 60)) ==
      Seq(("scaleToSeconds(b,60)", 0L, None)))
  }

  test("aggregateLine paints the per-series stat at every grid point") {
    val f = frame(("a", 0L, 1.0), ("a", 60L, null), ("a", 120L, 3.0))
    assert(vals(SeriesFunctions.aggregateLine(f, "avg")) == Seq(
      ("aggregateLine(a,'avg')", 0L, Some(2.0)),
      ("aggregateLine(a,'avg')", 60L, Some(2.0)),  // nulls painted too
      ("aggregateLine(a,'avg')", 120L, Some(2.0))))
    assert(vals(SeriesFunctions.aggregateLine(f, "max")).head._3 == Some(3.0))
  }

  test("withWildcards merge: removed nodes collapse series, nulls ignored") {
    val f = frame(("vera.u1.click", 0L, 1.0), ("vera.u2.click", 0L, 2.0),
      ("vera.u1.view", 0L, 10.0), ("vera.u1.click", 60L, null),
      ("vera.u2.click", 60L, null))
    assert(vals(SeriesFunctions.aggWithWildcards(f, "sum", Seq(1))) == Seq(
      ("vera.click", 0L, Some(3.0)), ("vera.click", 60L, None),
      ("vera.view", 0L, Some(10.0))))
    assert(vals(SeriesFunctions.aggWithWildcards(f, "avg", Seq(1)))
      .head._3 == Some(1.5))
  }

  test("percentile-band selection: outliers kept, interior dropped") {
    // five flat series 1..5 — per-t band (p=80): lo = rank 1 (=1),
    // hi = rank 4 (=4); kept = any v ≤ 1 or ≥ 4 → series 1, 4, 5
    val f = frame((1 to 5).flatMap(i =>
      Seq((s"s$i", 0L, java.lang.Double.valueOf(i.toDouble)),
        (s"s$i", 60L, java.lang.Double.valueOf(i.toDouble)))): _*)
    assert(vals(SeriesFunctions.removeBetweenPercentile(f, 80))
      .map(_._1).distinct.sorted == Seq("s1", "s4", "s5"))
    // the n<50 fold: 20 ≡ 80
    assert(vals(SeriesFunctions.removeBetweenPercentile(f, 20))
      .map(_._1).distinct.sorted == Seq("s1", "s4", "s5"))
    // averageOutsidePercentile on the same frame: means are 1..5,
    // band (30th,70th) = (1, 4) → kept: means ≤1 or ≥4
    assert(vals(SeriesFunctions.averageOutsidePercentile(f, 70))
      .map(_._1).distinct.sorted == Seq("s1", "s4", "s5"))
  }

  test("fallbackSeries: empty primary falls back, non-empty wins") {
    val primary = frame(("a", 0L, 1.0))
    val fb = frame(("fallback", 0L, 9.0))
    assert(vals(SeriesFunctions.fallbackSeries(primary, fb)).head._1 == "a")
    assert(vals(SeriesFunctions.fallbackSeries(
      primary.filter(col("path") === "nope"), fb)).head._1 == "fallback")
    // through the evaluator: a dead glob falls back to the live one
    val fetch = (g: String) =>
      if (g == "dead.glob") primary.filter(col("path") === "nope") else primary
    assert(vals(TargetExpr.evalTarget("fallbackSeries(dead.glob,live.glob)", fetch))
      .head._1 == "a")
  }

  test("minimumBelow through the evaluator keeps series under the gate") {
    val f = frame(("a", 0L, 1.0), ("a", 60L, 9.0),
      ("b", 0L, 5.0), ("b", 60L, 9.0))
    val fetch = (_: String) => f
    // min(a)=1 < 3 keeps; min(b)=5 drops
    assert(vals(TargetExpr.evalTarget("minimumBelow(x.y,3)", fetch))
      .map(_._1).distinct == Seq("a"))
  }

  test("aggregate dispatches every combine func; unknown funcs fail loudly") {
    val f = frame(("a", 0L, 1.0), ("b", 0L, 5.0), ("a", 60L, null), ("b", 60L, null))
    val fetch = (_: String) => f
    def at0(target: String) = vals(TargetExpr.evalTarget(target, fetch)).head._3.get
    assert(at0("""aggregate(x.y,"sum")""") == 6.0)
    assert(at0("""aggregate(x.y,"average")""") == 3.0)
    assert(at0("""aggregate(x.y,"range")""") == 4.0)
    assert(at0("""aggregate(x.y,"max")""") == 5.0)
    // all-null timestamp stays null under every func (safe* rule)
    assert(vals(TargetExpr.evalTarget("""aggregate(x.y,"sum")""", fetch))(1)._3.isEmpty)
    // the combined series is named by the call text
    assert(vals(TargetExpr.evalTarget("""aggregate(x.y,"min")""", fetch))
      .head._1 == """aggregate(x.y,"min")""")
    intercept[IllegalArgumentException](
      TargetExpr.evalTarget("""aggregate(x.y,"median")""", fetch).collect())
  }

  test("groupByNodes joins the selected node values; multi-dim rollup") {
    val f = frame(
      ("dc1.hostA.cpu", 0L, 1.0), ("dc1.hostA.mem", 0L, 10.0),
      ("dc2.hostA.cpu", 0L, 2.0), ("dc1.hostB.cpu", 0L, 4.0))
    val fetch = (_: String) => f
    // nodes (1,2): host.metric — dc1/dc2 hostA cpu merge
    val out = vals(TargetExpr.evalTarget("""groupByNodes(x.y,"sum",1,2)""", fetch))
    assert(out.toSet == Set(
      ("hostA.cpu", 0L, Some(3.0)), ("hostA.mem", 0L, Some(10.0)),
      ("hostB.cpu", 0L, Some(4.0))))
  }

  test("minMax normalizes per series; flat series reads 0; nulls survive") {
    val f = frame(("a", 0L, 2.0), ("a", 60L, null), ("a", 120L, 6.0),
      ("b", 0L, 5.0), ("b", 60L, 5.0))
    val out = vals(SeriesFunctions.minMax(f))
    assert(out == Seq(
      ("minMax(a)", 0L, Some(0.0)), ("minMax(a)", 60L, None),
      ("minMax(a)", 120L, Some(1.0)),
      ("minMax(b)", 0L, Some(0.0)), ("minMax(b)", 60L, Some(0.0))))
  }

  test("unique collapses overlapping-glob duplicates; keepLastValue limit bridges") {
    // group of overlapping globs duplicates the shared series' rows
    val a = frame(("a", 0L, 1.0), ("a", 60L, null), ("a", 120L, null),
      ("a", 180L, null), ("a", 240L, 5.0))
    val dup = SeriesFunctions.group(Seq(a, a))
    assert(dup.count() == 10)
    val u = SeriesFunctions.uniqueSeries(dup)
    assert(u.count() == 5)
    // limit 2: the 3-null run stays ENTIRELY broken (graphite bridges
    // a consecutive-None run only when its whole length is <= limit)
    val out = vals(SeriesFunctions.keepLastValue(u, 2))
    assert(out == Seq(
      ("keepLastValue(a)", 0L, Some(1.0)), ("keepLastValue(a)", 60L, None),
      ("keepLastValue(a)", 120L, None), ("keepLastValue(a)", 180L, None),
      ("keepLastValue(a)", 240L, Some(5.0))))
    // a 2-null run bridges in full, and a trailing run <= limit fills
    // too (graphite's final consecutiveNones check after the loop)
    val b = frame(("b", 0L, 1.0), ("b", 60L, null), ("b", 120L, null),
      ("b", 180L, 7.0), ("b", 240L, null))
    assert(vals(SeriesFunctions.keepLastValue(b, 2)) == Seq(
      ("keepLastValue(b)", 0L, Some(1.0)), ("keepLastValue(b)", 60L, Some(1.0)),
      ("keepLastValue(b)", 120L, Some(1.0)), ("keepLastValue(b)", 180L, Some(7.0)),
      ("keepLastValue(b)", 240L, Some(7.0))))
    // a trailing run longer than the limit stays broken
    val c = frame(("c", 0L, 1.0), ("c", 60L, null), ("c", 120L, null),
      ("c", 180L, null))
    assert(vals(SeriesFunctions.keepLastValue(c, 2)).map(_._3) ==
      Seq(Some(1.0), None, None, None))
    // leading gap: nothing seen yet stays null even within the limit
    val lead = frame(("x", 0L, null), ("x", 60L, 3.0))
    assert(vals(SeriesFunctions.keepLastValue(lead, 2)).head._3.isEmpty)
  }

  test("useSeriesAbove: gate, name rewrite, related-metric fetch") {
    val rows = frame(
      ("s.a.reqs", 0L, 50.0), ("s.a.time", 0L, 0.9),
      ("s.b.reqs", 0L, 5.0), ("s.b.time", 0L, 0.2),
      ("s.c.reqs", 0L, 60.0)) // qualifies but has no related metric
    def fetchAt(glob: String, shift: Long): DataFrame = {
      val re = "^" + glob.replace(".", "\\.").replace("{", "(")
        .replace("}", ")").replace(",", "|").replace("*", "[^.]+") + "$"
      rows.filter(col("path").rlike(re))
    }
    // a and c clear the max>10 gate; only a's rewritten metric exists,
    // so exactly its related series draws (the graphite idiom: plot
    // response time for servers handling real traffic)
    assert(vals(TargetExpr.evalTargetAt(
      """useSeriesAbove(s.*.reqs,10,"reqs","time")""", fetchAt)) ==
      Seq(("s.a.time", 0L, Some(0.9))))
    // nobody qualifies → a typed empty frame, not an error
    assert(TargetExpr.evalTargetAt(
      """useSeriesAbove(s.*.reqs,1000,"reqs","time")""", fetchAt).count() == 0)
  }

  test("reduceSeries: matcher pairing, null laws, prefix naming") {
    val f = frame(
      ("h.a.used", 0L, 1.0), ("h.a.total", 0L, 4.0),
      ("h.b.used", 0L, 3.0), ("h.b.total", 0L, 0.0), // zero denominator
      ("h.c.used", 0L, 5.0))                          // missing denominator
    def run(fn: String) = vals(TargetExpr.eval(parse(
      s"""reduceSeries(mapSeries(h.*.*,1),"$fn",2,"used","total")"""),
      _ => f))
    // divide: per-prefix ratio, zero/absent denominator → null,
    // result named by the prefix
    assert(run("divideSeries") == Seq(
      ("h.a", 0L, Some(0.25)), ("h.b", 0L, None), ("h.c", 0L, None)))
    assert(run("asPercent") == Seq(
      ("h.a", 0L, Some(25.0)), ("h.b", 0L, None), ("h.c", 0L, None)))
    // diff subtracts 0 for a missing subtrahend (the diffSeries law)
    assert(run("diffSeries") == Seq(
      ("h.a", 0L, Some(-3.0)), ("h.b", 0L, Some(3.0)), ("h.c", 0L, Some(5.0))))
    intercept[IllegalArgumentException](run("multiply"))
    // the missing-side law is ASYMMETRIC (documented): a prefix with
    // only the matcher2 side is DROPPED — graphite's own reduceSeries
    // feeds a None placeholder to the reduce function there (an
    // error, not a series), so the drop is the defined replacement
    val g = frame(
      ("h.a.used", 0L, 1.0), ("h.a.total", 0L, 4.0),
      ("h.z.total", 0L, 7.0)) // no h.z.used → no h.z row
    def runG(fn: String) = vals(TargetExpr.eval(parse(
      s"""reduceSeries(mapSeries(h.*.*,1),"$fn",2,"used","total")"""),
      _ => g))
    assert(runG("divideSeries") == Seq(("h.a", 0L, Some(0.25))))
    assert(runG("diffSeries") == Seq(("h.a", 0L, Some(-3.0))))
  }

  test("groupByTags: canonical tagged output path, missing-tag empty value") {
    val f = frame(
      ("cpu;dc=east;host=a", 0L, 1.0), ("cpu;dc=east;host=b", 0L, 3.0),
      ("cpu;dc=west;host=c", 0L, 5.0), ("mem;host=d", 0L, 7.0))
    val run = vals(evalTarget("""groupByTags(x.*,"sum","dc")""",
      _ => f))
    // name leads, requested tags append in sorted-tag order; the
    // dc-less mem series groups under the empty value
    assert(run == Seq(
      ("cpu;dc=east", 0L, Some(4.0)), ("cpu;dc=west", 0L, Some(5.0)),
      ("mem;dc=", 0L, Some(7.0))))
    // 'name' among the requested tags dedups into the lead position;
    // multi-tag requests sort canonically regardless of call order
    val two = vals(evalTarget("""groupByTags(x.*,"max","host","dc","name")""",
      _ => f))
    assert(two.map(_._1) ==
      Seq("cpu;dc=east;host=a", "cpu;dc=east;host=b", "cpu;dc=west;host=c",
        "mem;dc=;host=d"))
    intercept[IllegalArgumentException](evalTarget("""groupByTags(x.*,"sum")""", _ => f))
  }

  test("filterSeries: all six operators gate on the round-6 stat grid") {
    val f = frame(("a", 0L, 1.0), ("a", 60L, 3.0),
      ("b", 0L, 5.0), ("b", 60L, 7.0), ("c", 0L, null), ("c", 60L, null))
    def run(op: String, th: Double) =
      vals(evalTarget(s"""filterSeries(x.*,"average","$op",$th)""", _ => f))
        .map(_._1).distinct
    assert(run(">", 2) == Seq("b"))
    assert(run(">=", 2) == Seq("a", "b"))
    assert(run("<", 6) == Seq("a"))
    assert(run("<=", 6) == Seq("a", "b"))
    assert(run("=", 6) == Seq("b"))
    assert(run("!=", 6) == Seq("a")) // all-null stat fails every test
    intercept[IllegalArgumentException](run("~", 1))
    // 'current' rides the shared seriesStat table (latest non-null)
    assert(vals(evalTarget("""filterSeries(x.*,"current",">",4)""", _ => f))
      .map(_._1).distinct == Seq("b"))
  }

  test("scalar sweep: round half-up, add, exp, sigmoid, logit domain law") {
    val f = frame(("s", 0L, 0.25), ("s", 60L, -0.5), ("s", 120L, null),
      ("s", 180L, 1.0))
    assert(vals(evalTarget("add(s,2)", _ => f)) == Seq(
      ("add(s,2)", 0L, Some(2.25)), ("add(s,2)", 60L, Some(1.5)),
      ("add(s,2)", 120L, None), ("add(s,2)", 180L, Some(3.0))))
    assert(vals(evalTarget("round(s,1)", _ => f)) == Seq(
      ("round(s,1)", 0L, Some(0.3)), // 0.25 rounds HALF-UP (documented)
      ("round(s,1)", 60L, Some(-0.5)), ("round(s,1)", 120L, None),
      ("round(s,1)", 180L, Some(1.0))))
    val sig = vals(evalTarget("sigmoid(s)", _ => f))
    assert(math.abs(sig.head._3.get - 1.0 / (1.0 + math.exp(-0.25))) < 1e-12)
    assert(sig(2)._3.isEmpty)
    val ex = vals(evalTarget("exp(s)", _ => f))
    assert(math.abs(ex.head._3.get - math.exp(0.25)) < 1e-12)
    // logit: defined only on (0,1) — 0.25 maps, -0.5 and 1.0 null out
    val lg = vals(evalTarget("logit(s)", _ => f))
    assert(math.abs(lg.head._3.get - math.log(0.25 / 0.75)) < 1e-12)
    assert(lg(1)._3.isEmpty && lg(2)._3.isEmpty && lg(3)._3.isEmpty)
  }

  test("aggregateWithWildcards rides the shared canonAgg table") {
    val f = frame(("a.x.m", 0L, 1.0), ("a.y.m", 0L, 5.0))
    assert(vals(evalTarget("""aggregateWithWildcards(a.*.m,"max",1)""", _ => f)) ==
      Seq(("a.m", 0L, Some(5.0))))
    assert(vals(evalTarget("""aggregateWithWildcards(a.*.m,"range",1)""", _ => f)) ==
      Seq(("a.m", 0L, Some(4.0))))
    intercept[IllegalArgumentException](
      evalTarget("""aggregateWithWildcards(a.*.m,"nope",1)""", _ => f))
  }

  test("*SeriesLists: sorted-name pairing, per-func null laws, length guard") {
    val a = frame(("n.1", 0L, 6.0), ("n.1", 60L, null), ("n.1", 120L, 4.0),
      ("n.2", 0L, 10.0))
    val b = frame(("d.1", 0L, 3.0), ("d.1", 60L, 5.0), ("d.1", 120L, 0.0),
      ("d.2", 0L, 2.0))
    def run(t: String) = vals(evalAt(parse(t), (g, _) =>
      if (g == "A") a else b, 0L))
    // divide: zero divisor null, null dividend null
    assert(run("divideSeriesLists(A,B)") == Seq(
      ("divideSeries(n.1,d.1)", 0L, Some(2.0)),
      ("divideSeries(n.1,d.1)", 60L, None),
      ("divideSeries(n.1,d.1)", 120L, None),
      ("divideSeries(n.2,d.2)", 0L, Some(5.0))))
    // diff: missing side reads 0; multiply: either missing nulls
    assert(run("diffSeriesLists(A,B)").take(3) == Seq(
      ("diffSeries(n.1,d.1)", 0L, Some(3.0)),
      ("diffSeries(n.1,d.1)", 60L, Some(-5.0)),
      ("diffSeries(n.1,d.1)", 120L, Some(4.0))))
    assert(run("""aggregateSeriesLists(A,B,"multiply")""").take(2) == Seq(
      ("multiplySeries(n.1,d.1)", 0L, Some(18.0)),
      ("multiplySeries(n.1,d.1)", 60L, None)))
    assert(run("sumSeriesLists(A,B)").head ==
      ("sumSeries(n.1,d.1)", 0L, Some(9.0)))
    // the 4-arg xFilesFactor form (ADVICE r9): 0.99 demands BOTH
    // sides present — the t=60 mixed point sum keeps without a gate
    // reads null here; 0.5 admits one-sided points again
    assert(run("""aggregateSeriesLists(A,B,"sum",0.99)""").take(3) == Seq(
      ("sumSeries(n.1,d.1)", 0L, Some(9.0)),
      ("sumSeries(n.1,d.1)", 60L, None),
      ("sumSeries(n.1,d.1)", 120L, Some(4.0))))
    assert(run("""aggregateSeriesLists(A,B,"sum",0.5)""")(1) ==
      ("sumSeries(n.1,d.1)", 60L, Some(5.0)))
    // out-of-range xff fails loudly
    intercept[IllegalArgumentException](
      run("""aggregateSeriesLists(A,B,"sum",1.5)"""))
    // mismatched list lengths fail loudly (graphite raises too)
    val short = frame(("d.1", 0L, 3.0))
    intercept[IllegalArgumentException](
      evalAt(parse("divideSeriesLists(A,B)"), (g, _) =>
        if (g == "A") a else short, 0L).collect())
  }

  test("cactiStyle: Current/Max/Min suffix, all-null series reads nan") {
    val f = frame(("a", 0L, 1.256), ("a", 60L, 3.0), ("a", 120L, null),
      ("n", 0L, null), ("n", 60L, null), ("n", 120L, null))
    val out = vals(evalTarget("cactiStyle(x.*)", _ => f))
    // current = latest non-null (3.0 at t=60, not the t=120 gap)
    assert(out.map(_._1).distinct == Seq(
      "a Current:3.00 Max:3.00 Min:1.26",
      "n Current:nan Max:nan Min:nan"))
    // values untouched
    assert(out.filter(_._1.startsWith("a")).map(_._3) ==
      Seq(Some(1.256), Some(3.0), None))
  }

  test("legendValue: per-stat suffixes, None for all-null, si rejected (r10)") {
    val f = frame(("a", 0L, 1.256), ("a", 60L, 3.0), ("a", 120L, null),
      ("n", 0L, null), ("n", 60L, null))
    val out = vals(evalTarget("""legendValue(x.*,"avg","max","total")""", _ => f))
    assert(out.map(_._1).distinct.sorted == Seq(
      "a (avg: 2.13) (max: 3.00) (total: 4.26)",
      "n (avg: None) (max: None) (total: None)"))
    // values untouched; 'last' rides the position stat
    assert(out.filter(_._1.startsWith("a")).map(_._3) ==
      Seq(Some(1.256), Some(3.0), None))
    assert(vals(evalTarget("""legendValue(x.*,"last")""", _ => f))
      .map(_._1).distinct.sorted.head == "a (last: 3.00)")
    intercept[IllegalArgumentException](
      evalTarget("""legendValue(x.*,"avg","si")""", _ => f))
    intercept[IllegalArgumentException](
      evalTarget("""legendValue(x.*)""", _ => f))
  }

  test("aggregate xFilesFactor, interpolate limit, aggregateLine stat table") {
    // xff: 2 series; t=0 both present (1.0), t=60 one present (0.5),
    // t=120 neither (0.0)
    val f = frame(("a", 0L, 2.0), ("a", 60L, 4.0), ("a", 120L, null),
      ("b", 0L, 6.0), ("b", 60L, null), ("b", 120L, null))
    def run(t: String) = vals(evalTarget(t, _ => f))
    assert(run("""aggregate(x.*,"sum",0.6)""").map(_._3) ==
      Seq(Some(8.0), None, None)) // 0.5 < 0.6 gates t=60
    assert(run("""aggregate(x.*,"sum",0.5)""").map(_._3) ==
      Seq(Some(8.0), Some(4.0), None)) // >= is inclusive
    assert(run("""aggregate(x.*,"sum",0)""").map(_._3) ==
      Seq(Some(8.0), Some(4.0), None)) // all-null stays null (SQL agg)
    intercept[IllegalArgumentException](run("""aggregate(x.*,"sum",1.5)"""))
    // interpolate limit: a 1-gap bridges, a 3-gap stays broken
    val g = frame(("s", 0L, 0.0), ("s", 60L, null), ("s", 120L, 6.0),
      ("s", 180L, null), ("s", 240L, null), ("s", 300L, null), ("s", 360L, 12.0))
    assert(run2(g, "interpolate(s,2)").map(_._3) ==
      Seq(Some(0.0), Some(3.0), Some(6.0), None, None, None, Some(12.0)))
    // and the unlimited form still bridges everything interior
    assert(run2(g, "interpolate(s)").map(_._3) ==
      Seq(Some(0.0), Some(3.0), Some(6.0), Some(7.5), Some(9.0),
        Some(10.5), Some(12.0)))
    // aggregateLine rides the shared table: 'total' and 'last' work,
    // unknown funcs stay loud
    assert(run2(g, """aggregateLine(s,"total")""").map(_._3).distinct ==
      Seq(Some(18.0)))
    assert(run2(g, """aggregateLine(s,"last")""").map(_._3).distinct ==
      Seq(Some(12.0)))
    intercept[IllegalArgumentException](run2(g, """aggregateLine(s,"nope")"""))
    // setXFilesFactor context plumbing (r10): the 2-arg aggregate
    // reads the factor the subtree's setXFilesFactor wrote — identical
    // to the explicit 3-arg form — and the series names are UNTOUCHED
    // (graphite keeps names here; contrast consolidateBy)
    val viaCtx = run("""aggregate(setXFilesFactor(x.*,0.6),"sum")""")
    assert(viaCtx.map(_._3) == Seq(Some(8.0), None, None))
    assert(viaCtx.map(_._1).distinct ==
      Seq("""aggregate(setXFilesFactor(x.*,0.6),"sum")"""))
    // alias, and the explicit 3rd argument beats the context
    assert(run("""aggregate(xFilesFactor(x.*,0.6),"sum",0.5)""").map(_._3) ==
      Seq(Some(8.0), Some(4.0), None))
    // 1-arg removeEmptySeries reads the context too: at 0.6, series b
    // (1/3 non-null) drops while a (2/3) survives
    assert(run("""removeEmptySeries(setXFilesFactor(x.*,0.6))""")
      .map(_._1).distinct == Seq("a"))
    // setXFilesFactor alone renames nothing and changes no values
    assert(run("""setXFilesFactor(x.*,0.6)""") == run("group(x.*)"))
    // a fresh evaluation starts with an empty context: no gate
    assert(run("""aggregate(x.*,"sum")""").map(_._3) ==
      Seq(Some(8.0), Some(4.0), None))
    intercept[IllegalArgumentException](run("""setXFilesFactor(x.*,1.5)"""))
  }

  private def run2(g: org.apache.spark.sql.DataFrame, t: String) =
    vals(evalTarget(t, _ => g))

  test("moving* string windowSize: time-range window ≡ point window on dense grids") {
    // 60s grid: "3min" must equal the 3-point form pointwise (values),
    // names carry the quoted interval vs the bare count
    val f = frame(("a", 0L, 2.0), ("a", 60L, null), ("a", 120L, 4.0),
      ("a", 180L, 6.0), ("a", 240L, 8.0))
    def v(t: String) = vals(evalTarget(t, _ => f)).map(x => (x._2, x._3))
    assert(v("""movingAverage(a,"3min")""") == v("movingAverage(a,3)"))
    assert(v("""movingSum(a,"3min")""") == v("movingSum(a,3)"))
    assert(v("""movingMedian(a,"3min")""") == v("movingMedian(a,3)"))
    assert(v("""movingWindow(a,"3min","max")""") == v("movingMax(a,3)"))
    assert(vals(evalTarget("""movingMin(a,"2min")""", _ => f)).map(_._1).distinct
      == Seq("movingMin(a,\"2min\")"))
    // on an IRREGULAR grid the range window is time-true: at t=500 a
    // "2min" window reaches back to 381+, seeing only the t=420 point
    val g = frame(("b", 0L, 10.0), ("b", 420L, 4.0), ("b", 500L, 6.0))
    assert(vals(evalTarget("""movingAverage(b,"2min")""", _ => g)).map(_._3) ==
      Seq(Some(10.0), Some(4.0), Some(5.0)))
    // a float windowSize is neither a point count nor an interval
    intercept[IllegalArgumentException](evalTarget("movingAverage(a,2.5)", _ => f))
  }

  test("display-option family: no-rename setters identity, renamers exact") {
    val f = frame(("a.b", 0L, 1.5), ("a.b", 60L, null))
    // color/lineWidth/alpha: graphite sets style attributes without
    // renaming — data surface is the identity
    for (t <- Seq("""color(a.b,"red")""", "lineWidth(a.b,2)", "alpha(a.b,0.5)"))
      assert(vals(evalTarget(t, _ => f)) ==
        Seq(("a.b", 0L, Some(1.5)), ("a.b", 60L, None)), t)
    // dashed/stacked/drawAsInfinite rename exactly as graphite-web
    assert(vals(evalTarget("dashed(a.b)", _ => f)).map(_._1).distinct ==
      Seq("dashed(a.b, 5)"))
    assert(vals(evalTarget("dashed(a.b,2.5)", _ => f)).map(_._1).distinct ==
      Seq("dashed(a.b, 2.5)"))
    assert(vals(evalTarget("""stacked(a.b,"grp")""", _ => f)).map(_._1).distinct ==
      Seq("stacked(a.b)"))
    assert(vals(evalTarget("drawAsInfinite(a.b)", _ => f)) ==
      Seq(("drawAsInfinite(a.b)", 0L, Some(1.5)),
        ("drawAsInfinite(a.b)", 60L, None)))
    // argument validation is loud
    intercept[IllegalArgumentException](evalTarget("alpha(a.b,1.5)", _ => f))
    intercept[IllegalArgumentException](evalTarget("lineWidth(a.b,0)", _ => f))
    intercept[IllegalArgumentException](evalTarget("dashed(a.b,-1)", _ => f))
  }

  test("window generators: constantLine 3 points, time grid, threshold label") {
    val env = Some(WindowEnv(spark, 1000L, 2000L))
    def run(t: String) = vals(evalAt(parse(t), (_, _) =>
      frame(("x", 0L, 1.0)), 0L, None, env))
    assert(run("constantLine(42.5)") == Seq(
      ("42.5", 1000L, Some(42.5)), ("42.5", 1500L, Some(42.5)),
      ("42.5", 2000L, Some(42.5))))
    assert(run("""threshold(95,"limit")""").map(_._1).distinct == Seq("limit"))
    assert(run("""time("tick",300)""") == Seq(
      ("tick", 1000L, Some(1000.0)), ("tick", 1300L, Some(1300.0)),
      ("tick", 1600L, Some(1600.0)), ("tick", 1900L, Some(1900.0))))
    // identity = time at step 60; [from, until) exclusive end
    assert(run("""identity("id")""").size == 17)
    // under a timeShift subtree the generator synthesizes the SHIFTED
    // window and relabels back onto the render grid (graphite's order)
    assert(run("""timeShift(time("tick",500),"-500s")""") == Seq(
      ("timeShift(tick,\"-500s\")", 1000L, Some(500.0)),
      ("timeShift(tick,\"-500s\")", 1500L, Some(1000.0))))
    // no WindowEnv → loud failure, the TagEnv convention
    intercept[IllegalArgumentException](
      evalTarget("constantLine(1)", _ => frame(("x", 0L, 1.0))))
    // verticalLine (r10): two 1.0 points at [ts, ts+1], named by the
    // label (default vertical_line), color accepted-and-dropped;
    // the timestamp must parse and must sit INSIDE the window
    assert(run("""verticalLine("1970-01-01T00:20:00","deploy","blue")""") ==
      Seq(("deploy", 1200L, Some(1.0)), ("deploy", 1201L, Some(1.0))))
    assert(run("""verticalLine("1970-01-01T00:20:00")""").map(_._1).distinct ==
      Seq("vertical_line"))
    intercept[IllegalArgumentException](
      run("""verticalLine("1970-01-01T00:10:00")""")) // before start
    intercept[IllegalArgumentException](
      run("""verticalLine("1970-01-01T01:00:00")""")) // after end
    intercept[IllegalArgumentException](
      run("""verticalLine("no-such-time")"""))
  }

  test("aliasQuery: second fetch, %d format, loud on empty lookup (r10)") {
    // clicks rename by the view sibling's LAST non-null value; the
    // collect path (no TagEnv) and the TagEnv path must agree
    val f = frame(
      ("m.a.click", 0L, 5.0), ("m.a.click", 60L, 7.0),
      ("m.a.view", 0L, 41.9), ("m.a.view", 60L, null),
      ("m.b.click", 0L, 2.0),
      ("m.b.view", 0L, 10.0), ("m.b.view", 60L, 12.5))
    val fetch = (g: String, _: Long) =>
      f.filter(col("path").rlike(Glob.queryToRegex(g, allowDeeper = false)))
    def run(t: String, env: Option[TargetExpr.TagEnv]) =
      vals(TargetExpr.evalAt(TargetExpr.parse(t), fetch, 0L, env))
    val t = """aliasQuery(m.*.click,"\.click$",".view","last=%d")"""
    val noEnv = run(t, None)
    // a: last view = 41.9 at t=0 (t=60 is a gap) → 41; b: 12.5 → 12
    assert(noEnv == Seq(
      ("last=12", 0L, Some(2.0)),
      ("last=41", 0L, Some(5.0)), ("last=41", 60L, Some(7.0))))
    val env = TargetExpr.TagEnv(
      f.select(col("path")).distinct(),
      (pd, _) => f.join(broadcast(pd), Seq("path"), "left_semi"))
    assert(run(t, Some(env)) == noEnv)
    // %f formats too; exactly one conversion required
    assert(run("""aliasQuery(m.b.click,"\.click$",".view","v=%.1f")""", None)
      .map(_._1).distinct == Seq("v=12.5"))
    intercept[IllegalArgumentException](
      run("""aliasQuery(m.b.click,"\.click$",".view","plain")""", None))
    // a rewrite with no data fails loudly (graphite raises)
    intercept[IllegalArgumentException](
      run("""aliasQuery(m.a.click,"\.click$",".nope","x=%d")""", None))
  }

  test("generic highest/lowest/sortBy, removeEmptySeries, aligned summarize") {
    val f = frame(
      ("a", 0L, 1.0), ("a", 60L, 9.0), // total 10, stddev 4
      ("b", 0L, 4.0), ("b", 60L, 4.0), // total 8, stddev 0
      ("c", 0L, null), ("c", 60L, null), // empty
      ("d", 0L, 2.0), ("d", 60L, null)) // total 2, fill 50%
    // generic callbacks ride the ONE shared stat table
    assert(vals(SeriesFunctions.highest(f, 1, "total")).map(_._1).distinct
      == Seq("a"))
    assert(vals(SeriesFunctions.highest(f, 2, "stddev")).map(_._1).distinct
      == Seq("a", "b")) // stddev: a=4, b=0, d=0 (b beats d by path), c null
    assert(vals(SeriesFunctions.lowest(f, 1, "max")).map(_._1).distinct
      == Seq("d")) // maxima: d=2 < b=4 < a=9; null(c) last
    // sortBy: ascending by default (graphite), reverse flips; the ord
    // tag drives limit
    assert(vals(SeriesFunctions.limitSeries(
      SeriesFunctions.sortBySeries(f, "total", reverse = false), 1))
      .map(_._1).distinct == Seq("d"))
    assert(vals(SeriesFunctions.limitSeries(
      SeriesFunctions.sortBySeries(f, "total", reverse = true), 1))
      .map(_._1).distinct == Seq("a"))
    // removeEmptySeries: default drops only the all-null series; an
    // xff gate drops the half-filled one too
    assert(vals(SeriesFunctions.removeEmptySeries(f)).map(_._1).distinct
      == Seq("a", "b", "d"))
    assert(vals(SeriesFunctions.removeEmptySeries(f, 0.6)).map(_._1).distinct
      == Seq("a", "b"))
    // summarize alignToFrom: buckets anchor at the series' own first
    // point, not the epoch grid; graphite's 4-arg naming
    val e = frame(("e", 100L, 1.0), ("e", 160L, 2.0), ("e", 220L, 4.0))
    assert(vals(SeriesFunctions.summarizeAligned(e, 120L, "sum", "2min")) ==
      Seq(("""summarize(e, "2min", "sum", true)""", 100L, Some(3.0)),
        ("""summarize(e, "2min", "sum", true)""", 220L, Some(4.0))))
    // the same call through the parser's 4-arg summarize form
    val parsed = TargetExpr.eval(
      parse("""summarize(e.*,"2min","sum",true)"""), _ => e)
    assert(vals(parsed) == vals(SeriesFunctions.summarizeAligned(e, 120L, "sum", "2min")))
    // movingWindow is pure dispatch onto the named moving* family
    val mf = frame(("m", 0L, 1.0), ("m", 60L, 5.0), ("m", 120L, 3.0))
    for ((fn, named) <- Seq[(String, DataFrame => DataFrame)](
      "average" -> (SeriesFunctions.movingAverage(_, 2)),
      "sum" -> (SeriesFunctions.movingSum(_, 2)),
      "min" -> (SeriesFunctions.movingMin(_, 2)),
      "max" -> (SeriesFunctions.movingMax(_, 2)),
      "median" -> (SeriesFunctions.movingMedian(_, 2))))
      assert(vals(TargetExpr.eval(
        parse(s"""movingWindow(m,2,"$fn")"""), _ => mf)) == vals(named(mf)),
        fn)
  }

  test("applyByNode: per-group template, group-count-independent plan") {
    // hosts a/b carry err+total; host c has ONLY total — matched by
    // the template's %.total leg but absent from the input glob's
    // series, so it is NOT a group (graphite's prefix-set rule)
    val rows = frame(
      ("h.a.err", 0L, 1.0), ("h.a.err", 60L, 2.0),
      ("h.a.total", 0L, 4.0), ("h.a.total", 60L, 8.0),
      ("h.b.err", 0L, 3.0), ("h.b.err", 60L, null),
      ("h.b.total", 0L, 6.0), ("h.b.total", 60L, 0.0),
      ("h.c.total", 0L, 99.0))
    def fetchAt(rs: DataFrame)(glob: String, shift: Long): DataFrame = {
      val re = "^" + glob.replace(".", "\\.").replace("*", "[^.]+")
        .replace("?", "[^.]") + "$"
      rs.filter(col("path").rlike(re))
    }
    val out = TargetExpr.evalTargetAt(
      """applyByNode(h.*.err,1,"divideSeries(%.err,%.total)")""", fetchAt(rows))
    assert(vals(out) == Seq(
      ("divideSeries(h.a.err,h.a.total)", 0L, Some(0.25)),
      ("divideSeries(h.a.err,h.a.total)", 60L, Some(0.25)),
      ("divideSeries(h.b.err,h.b.total)", 0L, Some(0.5)),
      ("divideSeries(h.b.err,h.b.total)", 60L, None))) // null/0 → null
    // newName renames per prefix
    val named = TargetExpr.evalTargetAt(
      """applyByNode(h.*.err,1,"divideSeries(%.err,%.total)","%.ratio")""",
      fetchAt(rows))
    assert(vals(named).map(_._1).distinct == Seq("h.a.ratio", "h.b.ratio"))
    // per-group combiner: sums stay INSIDE the group (h.c excluded)
    val s = TargetExpr.evalTargetAt(
      """applyByNode(h.*.err,1,"sumSeries(%.*)")""", fetchAt(rows))
    assert(vals(s) == Seq(
      ("sumSeries(h.a.*)", 0L, Some(5.0)), ("sumSeries(h.a.*)", 60L, Some(10.0)),
      ("sumSeries(h.b.*)", 0L, Some(9.0)), ("sumSeries(h.b.*)", 60L, Some(0.0))))
    // ONE shuffle per stage, not per group: the physical plan's
    // exchange count does not grow with the number of groups
    def exchanges(df: DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val many = frame((0 until 8).flatMap(i => Seq(
      (s"h.x$i.err", 0L, java.lang.Double.valueOf(1.0)),
      (s"h.x$i.total", 0L, java.lang.Double.valueOf(2.0)))): _*)
    val target = """applyByNode(h.*.err,1,"divideSeries(%.err,%.total)")"""
    assert(exchanges(TargetExpr.evalTargetAt(target, fetchAt(rows))) ==
      exchanges(TargetExpr.evalTargetAt(target, fetchAt(many))))
    // an unsupported per-series function inside a template fails loudly
    intercept[IllegalArgumentException](TargetExpr.evalTargetAt(
      """applyByNode(h.*.err,1,"derivative(%.err)")""", fetchAt(rows)))
  }

  test("nonNegativeDerivative/perSecond maxValue: counter-wrap recovery") {
    // an 8-bit counter: climbs, wraps past 255, then "resets" to a
    // value ABOVE the ceiling (impossible for a real 8-bit counter →
    // null, graphite's rule: wrap only when curr <= maxValue)
    val c = frame(("c", 0L, 250.0), ("c", 60L, 253.0), ("c", 120L, 2.0),
      ("c", 180L, 300.0), ("c", 240L, 280.0))
    val d = vals(SeriesFunctions.nonNegativeDerivative(c, 255.0))
    assert(d.map(_._3) == Seq(
      None,          // no prev
      Some(3.0),     // plain positive step
      Some(5.0),     // wrap: 255 - 253 + 2 + 1
      Some(298.0),   // positive step (even though curr > max)
      None))         // decrease with curr 280 > 255: reset, not wrap
    // the maxValue form keeps the plain name (graphite renders no ceiling)
    assert(d.map(_._1).distinct == Seq("nonNegativeDerivative(c)"))
    // perSecond divides the same recovered deltas by the 60s step
    val p = vals(SeriesFunctions.perSecond(c, 255.0))
    assert(p.map(_._3) == Seq(
      None, Some(3.0 / 60), Some(5.0 / 60), Some(298.0 / 60), None))
    // without a ceiling, every decrease stays null (existing contract)
    assert(vals(SeriesFunctions.nonNegativeDerivative(c)).map(_._3) ==
      Seq(None, Some(3.0), None, Some(298.0), None))
  }

  test("consolidateBy tag overrides the default; maxDataPoints consolidation") {
    // 6 points, budget 3 → factor 2: row-order buckets of 2
    val a = frame(("a", 0L, 1.0), ("a", 60L, 5.0), ("a", 120L, 2.0),
      ("a", 180L, null), ("a", 240L, null), ("a", 300L, null))
    val tagged = SeriesFunctions.consolidateBy(a, "max")
    // graphite's rename carries the tag; values untouched by the tag
    assert(vals(tagged).map(_._1).distinct == Seq("""consolidateBy(a,"max")"""))
    assert(vals(tagged).map(_._3) == vals(a).map(_._3))
    // the tag OVERRIDES the default: per-bucket max, nulls dropped
    // inside a bucket, the all-null bucket stays null, first t kept
    assert(vals(SeriesFunctions.consolidate(tagged, 3)) == Seq(
      ("""consolidateBy(a,"max")""", 0L, Some(5.0)),
      ("""consolidateBy(a,"max")""", 120L, Some(2.0)),
      ("""consolidateBy(a,"max")""", 240L, None)))
    // untagged series consolidate by the AVERAGE default — NOT the
    // storage method: the render path never passes method here
    assert(vals(SeriesFunctions.consolidate(a, 3)) == Seq(
      ("a", 0L, Some(3.0)), ("a", 120L, Some(2.0)), ("a", 240L, None)))
    // first/last pick the first/last NON-NULL inside the bucket
    val fl = frame(("b", 0L, null), ("b", 60L, 7.0),
      ("b", 120L, 9.0), ("b", 180L, null))
    assert(vals(SeriesFunctions.consolidate(
      SeriesFunctions.consolidateBy(fl, "first"), 2)).map(_._3) ==
      Seq(Some(7.0), Some(9.0)))
    assert(vals(SeriesFunctions.consolidate(
      SeriesFunctions.consolidateBy(fl, "last"), 2)).map(_._3) ==
      Seq(Some(7.0), Some(9.0)))
    // a series within the budget passes through unchanged
    assert(vals(SeriesFunctions.consolidate(a, 6)) == vals(a))
    // unknown consolidation functions fail loudly at tag time
    intercept[IllegalArgumentException](SeriesFunctions.consolidateBy(a, "median"))
    // graphite's alias: cumulative(s) ≡ consolidateBy(s,'sum'),
    // including the delegated name
    assert(vals(TargetExpr.eval(parse("cumulative(a)"), _ => a)) ==
      vals(SeriesFunctions.consolidateBy(a, "sum")))
  }

  test("multiplySeriesWithWildcards: reduced-name product, missing factor nulls") {
    val f = frame(("r.a.cpu", 0L, 2.0), ("r.b.cpu", 0L, 3.0),
      ("r.a.cpu", 60L, 4.0), ("r.b.cpu", 60L, null))
    val out = vals(TargetExpr.evalTarget("multiplySeriesWithWildcards(x.y,1)",
      (_: String) => f))
    assert(out == Seq(("r.cpu", 0L, Some(6.0)), ("r.cpu", 60L, None)))
  }

  test("secondYAxis wraps the name and touches nothing else") {
    val f = frame(("a", 0L, 1.5))
    assert(vals(SeriesFunctions.secondYAxis(f)) ==
      Seq(("secondYAxis(a)", 0L, Some(1.5))))
  }
}
