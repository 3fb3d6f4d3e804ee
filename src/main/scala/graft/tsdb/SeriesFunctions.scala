package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graphite render-target FUNCTIONS over the fetch frame
  * (SURVEY.md §2.C9): the reference's render targets are plain globs
  * (graphite_cgi.lua:318-338 passes each target straight to fetch),
  * but every Graphite deployment composes them through the function
  * pipeline (`sumSeries`, `summarize`, `alias`, ...) — the natural
  * next ask of a user switching to this library, and pure
  * DataFrame-combinator territory.
  *
  * Frame contract (shared with [[Fetch]]): `(path STRING, t BIGINT,
  * value DOUBLE-nullable)` on a dense per-series time grid; gaps are
  * nulls. Every function is one narrow declarative transform —
  * groupBy(t) for the across-series combiners (one shuffle on the
  * timestamp key, map-side combined), window-over-path for the
  * per-series sequence functions (one shuffle on path — at 100 TB the
  * frame arrives partitioned by path from the fetch, so AQE elides
  * it), map-only for the pointwise family. Null semantics follow
  * Graphite's safe* helpers: aggregates ignore nulls and return null
  * only when every input is null (exactly SQL aggregate semantics, so
  * the DuckDB oracles share the arithmetic by construction).
  */
object SeriesFunctions {

  private val byPath = Window.partitionBy(col("path")).orderBy(col("t"))

  private def frame(f: DataFrame, path: Column, t: Column, value: Column): DataFrame =
    f.select(path.as("path"), t.as("t"), value.as("value"))

  // ---- across-series combiners: one groupBy(t) shuffle ----

  /** Per-timestamp aggregate across all input series, named `name`
    * (Graphite names the combined series after the call text, e.g.
    * `sumSeries(vera.u1?.click)` — the evaluator passes that in).
    * Aggregates ignore nulls; an all-null timestamp stays null
    * (Graphite safeSum/safeAvg/safeMin/safeMax).
    */
  def combine(f: DataFrame, func: String, name: String): DataFrame = {
    val agg = func match {
      case "sum" => sum(col("value"))
      case "avg" => avg(col("value"))
      case "min" => min(col("value"))
      case "max" => max(col("value"))
      // countSeries counts SERIES PRESENT (non-null values) at each
      // point — Graphite's len(row), constant only on gap-free frames
      case "count" => count(col("value"))
      // rangeOfSeries: spread across series at each point
      case "range" => max(col("value")) - min(col("value"))
      // stddevSeries: population deviation ACROSS series per point,
      // the explicit moment formula (the stdev discipline) so the
      // oracle replays the same float expression
      case "stddev" =>
        when(count(col("value")) > 0,
          sqrt(greatest(lit(0.0),
            (sum(col("value") * col("value")) -
              sum(col("value")) * sum(col("value")) / count(col("value"))) /
              count(col("value")))))
      case other => throw new IllegalArgumentException(s"combine: unknown func '$other'")
    }
    f.groupBy(col("t")).agg(agg.as("value"))
      .select(lit(name).as("path"), col("t"),
        col("value").cast("double").as("value"))
  }

  def sumSeries(f: DataFrame, name: String): DataFrame = combine(f, "sum", name)
  def averageSeries(f: DataFrame, name: String): DataFrame = combine(f, "avg", name)
  def minSeries(f: DataFrame, name: String): DataFrame = combine(f, "min", name)
  def maxSeries(f: DataFrame, name: String): DataFrame = combine(f, "max", name)

  /** Union of series lists — Graphite `group()`; map-only. */
  def group(fs: Seq[DataFrame]): DataFrame = fs.reduce(_ unionByName _)

  /** Point-wise ratio against a single divisor (Graphite
    * `divideSeries`): the divisor is first collapsed with safeSum the
    * way graphite-web does when handed a multi-series divisor; a zero
    * or null divisor point yields null. PER-DIVIDEND naming — each
    * dividend series keeps its identity wrapped as
    * `divideSeries(<dividend>,<divisorText>)` (graphite names every
    * output from the dividend it came from, so a multi-series dividend
    * yields one ratio series per input). One equi-join on t — the
    * divisor side is a combined single series (one row per grid
    * point), broadcast.
    */
  def divideSeries(dividend: DataFrame, divisor: DataFrame, divisorText: String): DataFrame = {
    val d = broadcast(divisor.groupBy(col("t"))
      .agg(sum(col("value")).as("dv")))
    frame(dividend.join(d, Seq("t"), "left"),
      concat(lit("divideSeries("), col("path"), lit(s",$divisorText)")),
      col("t"),
      when(col("dv") =!= 0, col("value") / col("dv")))
  }

  /** Each series as a per-timestamp percentage of the group total
    * (Graphite `asPercent` with no total argument): one groupBy(t)
    * total joined back on t; an all-null or zero total point is null.
    * Series keep graphite's wrapped names.
    */
  def asPercent(f: DataFrame): DataFrame = {
    val tot = f.groupBy(col("t")).agg(sum(col("value")).as("tot"))
    frame(f.join(broadcast(tot), Seq("t"), "left"),
      wrap("asPercent", ""), col("t"),
      when(col("tot") =!= 0, col("value") * 100.0 / col("tot")))
  }

  /** `asPercent(series, total)` with a CONSTANT total — map-only, each
    * point scaled to a share of the fixed budget; graphite's second
    * form.
    */
  def asPercentConst(f: DataFrame, total: Double): DataFrame = {
    require(total != 0, "asPercent: constant total must be non-zero")
    frame(f, wrap("asPercent", fmtNum(total)), col("t"),
      col("value") * 100.0 / total)
  }

  /** `asPercent(series, totalSeries)` — the total operand collapsed
    * with safeSum per timestamp (graphite hands a multi-series total to
    * sumSeries first), joined back broadcast; zero/absent total points
    * null. Per-series naming wraps the total's rendered call text.
    */
  def asPercentOf(f: DataFrame, total: DataFrame, totalText: String): DataFrame = {
    val tot = broadcast(total.groupBy(col("t")).agg(sum(col("value")).as("tot")))
    frame(f.join(tot, Seq("t"), "left"),
      concat(lit("asPercent("), col("path"), lit(s",$totalText)")),
      col("t"),
      when(col("tot") =!= 0, col("value") * 100.0 / col("tot")))
  }

  // ---- series filters: per-series stat gate, broadcast semi/anti ----

  /** Keep series whose per-series aggregate clears a threshold
    * (Graphite `averageAbove`/`averageBelow`/`maximumAbove`/
    * `minimumAbove`/`currentAbove`/...): the K-row stat table filters
    * on the round(,6) grid and semi-joins back — the highest/lowest
    * selection shape without the rank.
    */
  def filterByStat(f: DataFrame, stat: String, op: String, threshold: Double): DataFrame = {
    val statAgg: Column = stat match {
      case "average" => avg(col("value"))
      case "max" => max(col("value"))
      case "min" => min(col("value"))
      case "current" => max(when(col("value").isNotNull,
        struct(col("t"), col("value")))).getField("value")
      case other => throw new IllegalArgumentException(s"filterByStat: unknown stat '$other'")
    }
    val cmp: Column = op match {
      case "above" => round(col("s"), 6) > threshold
      case "below" => round(col("s"), 6) < threshold
      case other => throw new IllegalArgumentException(s"filterByStat: unknown op '$other'")
    }
    val keep = f.groupBy(col("path")).agg(statAgg.as("s"))
      .filter(cmp).select(col("path"))
    f.join(broadcast(keep), Seq("path"), "left_semi")
  }

  /** Keep / drop series whose NAME matches a Java regex (Graphite
    * `grep` / `exclude`); map-only… the match is a scan-stage filter.
    */
  def grep(f: DataFrame, pattern: String): DataFrame =
    f.filter(col("path").rlike(pattern))

  def exclude(f: DataFrame, pattern: String): DataFrame =
    f.filter(!col("path").rlike(pattern))

  /** First n series — in `ord` order when an upstream `sortBy*` tagged
    * the frame, else path order (Graphite `limit`; the path fallback is
    * deterministic — graphite-web takes store order, which is not an
    * order at all). The frame contract is restored on the way out: the
    * ordering tag does not escape.
    */
  def limitSeries(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"limit: n must be >= 1 (got $n)")
    val keep =
      if (f.columns.contains("ord"))
        f.select(col("path"), col("ord")).distinct()
          .orderBy(col("ord")).limit(n).select(col("path"))
      else f.select(col("path")).distinct()
        .orderBy(col("path")).limit(n)
    f.join(broadcast(keep), Seq("path"), "left_semi")
      .select(col("path"), col("t"), col("value"))
  }

  // ---- series ordering: a K-row rank tag, never a sort of the frame ----

  /** Shared `sortBy*` machinery: rank every series by a per-series
    * aggregate on the round(,6) grid (the ANN-family ranking
    * discipline — raw doubles can differ between engines in the last
    * ulp, and the path tie-break then decides) and tag each row with
    * its series' rank as an extra `ord` column. The ROWS never
    * shuffle into a global sort — ordering a series LIST is a K-row
    * problem, and downstream consumers ([[limitSeries]], a renderer
    * emitting legend order) read the tag. K-row rank table broadcast
    * back, same shape as [[highest]].
    */
  private def sortBySeriesStat(f: DataFrame, statAgg: Column,
                               descending: Boolean): DataFrame = {
    val s = if (descending) round(col("s"), 6).desc_nulls_last
            else round(col("s"), 6).asc_nulls_last
    val ranked = f.groupBy(col("path")).agg(statAgg.as("s"))
      .select(col("path"),
        row_number().over(Window.orderBy(s, col("path"))).as("ord"))
    f.join(broadcast(ranked), Seq("path"))
  }

  /** Graphite `sortByMaxima`: series ordered by their maximum,
    * highest first.
    */
  def sortByMaxima(f: DataFrame): DataFrame =
    sortBySeriesStat(f, max(col("value")), descending = true)

  /** Graphite `sortByMinima`: series ordered by their minimum, lowest
    * first (graphite-web filters to series whose max > 0 — a legacy
    * accident of its implementation, not ordering semantics; the
    * ordering alone is what composes).
    */
  def sortByMinima(f: DataFrame): DataFrame =
    sortBySeriesStat(f, min(col("value")), descending = false)

  /** Graphite `sortByTotal`: series ordered by their safeSum, highest
    * first.
    */
  def sortByTotal(f: DataFrame): DataFrame =
    sortBySeriesStat(f, sum(col("value")), descending = true)

  /** Graphite `sortByName`: natural path order — the rank tag makes
    * the order explicit for `limit`/legend consumers.
    */
  def sortByName(f: DataFrame): DataFrame = {
    val ranked = f.select(col("path")).distinct()
      .select(col("path"),
        row_number().over(Window.orderBy(col("path"))).as("ord"))
    f.join(broadcast(ranked), Seq("path"))
  }

  // ---- renames: map-only ----

  /** All series renamed to the literal `name` (Graphite `alias`). */
  def alias(f: DataFrame, name: String): DataFrame =
    frame(f, lit(name), col("t"), col("value"))

  /** All series renamed to their LAST dot-component (Graphite
    * `aliasByMetric`) — map-only.
    */
  def aliasByMetric(f: DataFrame): DataFrame =
    frame(f, element_at(split(col("path"), "\\."), -1),
      col("t"), col("value"))

  /** Graphite `groupByNode(series, nodeIndex, func)`: series grouped
    * by one path component, each group collapsed per timestamp with
    * the callback aggregate and named by its node value — THE graphite
    * idiom for "total per host/user/datacenter". One map-side-combined
    * groupBy(node, t) shuffle; aggregates ignore nulls, an all-null
    * (node, t) stays null (the safe* rule).
    */
  def groupByNode(f: DataFrame, node: Int, func: String): DataFrame = {
    val part = element_at(split(col("path"), "\\."),
      if (node >= 0) node + 1 else node)
    val g = f.select(part.as("path"), col("t"), col("value"))
    val agg = func match {
      case "sum" | "sumSeries" => sum(col("value"))
      case "avg" | "averageSeries" => avg(col("value"))
      case "min" | "minSeries" => min(col("value"))
      case "max" | "maxSeries" => max(col("value"))
      case other => throw new IllegalArgumentException(s"groupByNode: unknown func '$other'")
    }
    g.groupBy(col("path"), col("t")).agg(agg.cast("double").as("value"))
  }

  /** Path rebuilt from the selected dot-components (Graphite
    * `aliasByNode`; negative indices count from the end, out-of-range
    * indices drop — list semantics in both engines).
    */
  def aliasByNode(f: DataFrame, nodes: Seq[Int]): DataFrame = {
    val parts = split(col("path"), "\\.")
    val picked = nodes.map { i =>
      // element_at is 1-based and supports negative-from-end
      element_at(parts, if (i >= 0) i + 1 else i)
    }
    frame(f, concat_ws(".", picked: _*), col("t"), col("value"))
  }

  // ---- pointwise: map-only, name-wrapped like Graphite ----

  private def wrap(fn: String, extra: String): Column =
    concat(lit(s"$fn("), col("path"),
      lit(if (extra.isEmpty) ")" else s",$extra)"))

  def scale(f: DataFrame, k: Double): DataFrame =
    frame(f, wrap("scale", fmtNum(k)), col("t"), col("value") * k)

  def offset(f: DataFrame, k: Double): DataFrame =
    frame(f, wrap("offset", fmtNum(k)), col("t"), col("value") + k)

  def absolute(f: DataFrame): DataFrame =
    frame(f, wrap("absolute", ""), col("t"), abs(col("value")))

  // ---- per-series sequence functions: one window over path ----

  /** Point-to-point delta; null where either endpoint is a gap
    * (Graphite `derivative` — None propagates).
    */
  def derivative(f: DataFrame): DataFrame =
    frame(f, wrap("derivative", ""), col("t"),
      col("value") - lag(col("value"), 1).over(byPath))

  /** Delta clamped to counters: a negative step (counter wrap/reset)
    * reads as null, not a huge negative spike (Graphite
    * `nonNegativeDerivative`).
    */
  def nonNegativeDerivative(f: DataFrame): DataFrame = {
    val d = col("value") - lag(col("value"), 1).over(byPath)
    frame(f, wrap("nonNegativeDerivative", ""), col("t"),
      when(d >= 0, d))
  }

  /** Per-second rate: delta over the grid step derived from the
    * timestamps themselves (Graphite `perSecond`).
    */
  def perSecond(f: DataFrame): DataFrame = {
    val d = col("value") - lag(col("value"), 1).over(byPath)
    val dt = col("t") - lag(col("t"), 1).over(byPath)
    frame(f, wrap("perSecond", ""), col("t"),
      when(d >= 0 && dt > 0, d / dt))
  }

  /** Running total per series; gap points stay null, non-gap points
    * accumulate every non-null value so far (Graphite `integral`).
    */
  def integral(f: DataFrame): DataFrame =
    frame(f, wrap("integral", ""), col("t"),
      when(col("value").isNotNull,
        sum(col("value")).over(byPath.rowsBetween(Window.unboundedPreceding, 0))))

  /** Trailing n-point mean, nulls ignored inside the window; leading
    * partial windows average what exists (the SQL window’s natural
    * reading — pinned identically in the oracle; graphite-web itself
    * changed leading-edge semantics across versions).
    */
  def movingAverage(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingAverage window must be >= 1 (got $n)")
    frame(f, wrap("movingAverage", n.toString), col("t"),
      avg(col("value")).over(byPath.rowsBetween(-(n - 1), 0)))
  }

  /** Points below/above the threshold become gaps (Graphite
    * `removeBelowValue` / `removeAboveValue`) — map-only; the clamp
    * turns outliers into nulls the safe-aggregates then ignore.
    */
  def removeBelowValue(f: DataFrame, v: Double): DataFrame =
    frame(f, wrap("removeBelowValue", fmtNum(v)), col("t"),
      when(col("value") >= v, col("value")))

  def removeAboveValue(f: DataFrame, v: Double): DataFrame =
    frame(f, wrap("removeAboveValue", fmtNum(v)), col("t"),
      when(col("value") <= v, col("value")))

  /** Each series shifted down by its own minimum (Graphite
    * `offsetToZero`): one per-series min window, no extra shuffle past
    * the path partitioning the sequence family already uses.
    */
  def offsetToZero(f: DataFrame): DataFrame =
    frame(f, wrap("offsetToZero", ""), col("t"),
      col("value") - min(col("value")).over(
        Window.partitionBy(col("path"))))

  /** Trailing n-point sum, nulls ignored; an all-null window is null
    * (Graphite `movingSum`, same window discipline as
    * [[movingAverage]]).
    */
  def movingSum(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingSum window must be >= 1 (got $n)")
    frame(f, wrap("movingSum", n.toString), col("t"),
      sum(col("value")).over(byPath.rowsBetween(-(n - 1), 0)))
  }

  /** Trailing n-point population standard deviation, nulls ignored
    * inside the window; an all-null window is null (Graphite `stdev`).
    * Written as the explicit moment formula √((Σv² − (Σv)²/n)/n) —
    * not the engine's stddev_pop — so the oracle replays the SAME
    * floating-point expression over the same ordered window and the
    * two engines agree to the shared round-Eps grid; `greatest(0, ·)`
    * clamps the −ulp a catastrophic cancellation can leave on a
    * constant window.
    */
  def stdev(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"stdev window must be >= 1 (got $n)")
    val w = byPath.rowsBetween(-(n - 1), 0)
    val cnt = count(col("value")).over(w)
    val s = sum(col("value")).over(w)
    val s2 = sum(col("value") * col("value")).over(w)
    frame(f, wrap("stdev", n.toString), col("t"),
      when(cnt > 0, sqrt(greatest(lit(0.0), (s2 - s * s / cnt) / cnt))))
  }

  /** Graphite `nPercentile(series, p)`: every point of each series
    * replaced by that series' p-th percentile — the flat reference
    * line graphs draw against. The DISCRETE percentile (graphite's
    * getPercentile with interpolate=False): sort the non-null values,
    * take element max(1, ⌊p/100·(cnt+1)⌋) — an integer SELECTION, so
    * both engines pick the identical stored double and cross-engine
    * parity is exact by construction, no interpolation arithmetic to
    * drift. Plan: the K-row percentile table (one rank filter over a
    * per-series value window) broadcast back onto the grid; a series
    * with no non-null points stays all-null.
    */
  def nPercentile(f: DataFrame, p: Double): DataFrame = {
    require(p > 0 && p <= 100, s"nPercentile: p must be in (0,100] (got $p)")
    val wv = Window.partitionBy(col("path")).orderBy(col("value"), col("t"))
    val wp = Window.partitionBy(col("path"))
    val pv = f.filter(col("value").isNotNull)
      .select(col("path"), col("value"),
        row_number().over(wv).as("rn"), count(lit(1)).over(wp).as("cnt"))
      // rank clamped to [1, cnt]: p=100 selects the max instead of
      // overrunning the list (graphite's unclamped rule would index
      // past the end there)
      .filter(col("rn") === greatest(lit(1L), least(col("cnt"),
        floor(lit(p / 100.0) * (col("cnt") + 1)).cast("long"))))
      .select(col("path"), col("value").as("pv"))
    frame(f.join(broadcast(pv), Seq("path"), "left"),
      wrap("nPercentile", fmtNum(p)), col("t"), col("pv"))
  }

  /** Graphite `exponentialMovingAverage(series, n)`: α = 2/(n+1),
    * ema ← α·v + (1−α)·ema — the RECURSIVE smoother dashboards reach
    * for past movingAverage. A running recurrence is not a SQL window
    * aggregate, but per series it is a left fold: collect the ordered
    * points (sort_array over the grid — bounded by the render window,
    * the same contract every window function here relies on) and run
    * the fold INSIDE the row with the `aggregate` higher-order
    * function — stays in codegen, no UDF, no driver loop; K series
    * fold in parallel. State rule (pinned identically in the oracle's
    * WITH RECURSIVE): a null point emits null and leaves the state
    * untouched; the first non-null point seeds the state with its own
    * value. Both engines execute the identical multiply-add sequence
    * in the identical order, so results agree bit-for-bit before the
    * shared round.
    */
  def exponentialMovingAverage(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"exponentialMovingAverage window must be >= 1 (got $n)")
    val alpha = 2.0 / (n + 1)
    val pts = f.groupBy(col("path"))
      .agg(sort_array(collect_list(struct(col("t"),
        // nulls vanish from collect_list — encode them explicitly
        struct(col("value").isNotNull.as("p"),
          coalesce(col("value"), lit(0.0)).as("v")).as("pv")))).as("pts"))
    val folded = aggregate(
      col("pts"),
      struct(lit(null).cast("double").as("ema"),
        array().cast("array<struct<t:bigint,value:double>>").as("out")),
      (acc, x) => {
        val present = x.getField("pv").getField("p")
        val v = x.getField("pv").getField("v")
        val newEma = when(!present, acc.getField("ema"))
          .when(acc.getField("ema").isNull, v)
          .otherwise(lit(alpha) * v + lit(1.0 - alpha) * acc.getField("ema"))
        struct(newEma.as("ema"),
          concat(acc.getField("out"), array(struct(
            x.getField("t").as("t"),
            when(present, newEma).as("value")))).as("out"))
      },
      acc => acc.getField("out"))
    frame(pts.select(col("path"), explode(folded).as("e")),
      wrap("exponentialMovingAverage", n.toString),
      col("e.t"), col("e.value"))
  }

  /** Graphite `holtWintersForecast(series[, season])`: additive
    * triple-exponential smoothing — level, trend and a seasonal ring
    * of `L` grid slots, the Graphite aberration stack's foundation.
    * Like [[exponentialMovingAverage]] this is a true recurrence, so
    * it runs as an in-row left fold over the sorted collected grid,
    * and the oracle's WITH RECURSIVE replays the IDENTICAL float
    * sequence. Update rules (pinned in both engines; graphite's
    * init is version-drifty, this one is documented):
    * {{{
    *   forecast_i = lvl + trd + season[i mod L]    (null until seeded)
    *   lvl' = α(v − season[i mod L]) + (1−α)(lvl + trd)
    *   trd' = β(lvl' − lvl) + (1−β) trd
    *   season'[i mod L] = γ(v − lvl') + (1−γ) season[i mod L]
    * }}}
    * i is the GRID position (gaps advance the season ring), the first
    * non-null point seeds lvl with its own value (trd 0, season all
    * zeros), and null points emit the forecast but leave the state
    * untouched — the EMA rules generalized. α=0.1, β=0.0035, γ=0.1,
    * graphite's constants.
    */
  def holtWintersForecast(f: DataFrame, seasonPts: Int,
                          seasonText: String): DataFrame = {
    require(seasonPts >= 1, s"holtWinters season must be >= 1 point (got $seasonPts)")
    val (alpha, beta, gamma) = (0.1, 0.0035, 0.1)
    val L = seasonPts
    val pts = f.groupBy(col("path"))
      .agg(sort_array(collect_list(struct(col("t"),
        struct(col("value").isNotNull.as("p"),
          coalesce(col("value"), lit(0.0)).as("v")).as("pv")))).as("pts"))
    val zeros = array_repeat(lit(0.0), L)
    val folded = aggregate(
      col("pts"),
      struct(lit(null).cast("double").as("lvl"), lit(0.0).as("trd"),
        zeros.as("season"),
        array().cast("array<struct<t:bigint,value:double>>").as("out")),
      (acc, x) => {
        val i = size(acc.getField("out"))
        val k = pmod(i, lit(L))                      // 0-based ring slot
        val sk = element_at(acc.getField("season"), k + 1)
        val present = x.getField("pv").getField("p")
        val v = x.getField("pv").getField("v")
        val lvl = acc.getField("lvl")
        val trd = acc.getField("trd")
        val fc = when(lvl.isNull, lit(null).cast("double"))
          .otherwise(lvl + trd + sk)
        val lvlN = when(!present, lvl)
          .when(lvl.isNull, v)
          .otherwise(lit(alpha) * (v - sk) + lit(1 - alpha) * (lvl + trd))
        val trdN = when(!present || lvl.isNull, trd)
          .otherwise(lit(beta) * (lvlN - lvl) + lit(1 - beta) * trd)
        val skN = lit(gamma) * (v - lvlN) + lit(1 - gamma) * sk
        val seasonN = when(!present || lvl.isNull, acc.getField("season"))
          .otherwise(concat(
            slice(acc.getField("season"), lit(1), k),
            array(skN),
            slice(acc.getField("season"), k + 2, lit(L) - k - 1)))
        struct(lvlN.as("lvl"), trdN.as("trd"), seasonN.as("season"),
          concat(acc.getField("out"), array(struct(
            x.getField("t").as("t"), fc.as("value")))).as("out"))
      },
      acc => acc.getField("out"))
    frame(pts.select(col("path"), explode(folded).as("e")),
      concat(lit("holtWintersForecast("), col("path"),
        lit(s""","$seasonText")""")),
      col("e.t"), col("e.value"))
  }

  /** Graphite `linearRegression(series)`: each series replaced by its
    * ordinary-least-squares fitted line over the render window —
    * ŷ(t) = a + b·t at EVERY grid point (the fit fills gaps; that is
    * the point of drawing a trend). Engine parity by integer-exact
    * sums: per series, t recenters to its window minimum (bounded
    * magnitudes) and values ride the 1e-6 fixed-point grid, so Σt′,
    * Σv, Σt′v, Σt′² are exact BIGINTs in both engines and the
    * closed-form slope/intercept is one identical float expression. A
    * series with fewer than 2 distinct non-null timestamps has no line
    * (null). One aggregate per series (K rows) broadcast back — never
    * a frame sort.
    */
  def linearRegression(f: DataFrame): DataFrame = {
    val nn = f.filter(col("value").isNotNull)
      .select(col("path"), col("t"),
        round(col("value") * 1e6, 0).cast("long").as("vfp"))
      .withColumn("t0", min(col("t")).over(Window.partitionBy(col("path"))))
      .withColumn("tr", col("t") - col("t0"))
    val fit = nn.groupBy(col("path"))
      .agg(count(lit(1)).as("n"), min(col("t0")).as("t0"),
        sum(col("tr")).as("st"), sum(col("vfp")).as("sv"),
        sum(col("tr") * col("vfp")).as("stv"),
        sum(col("tr") * col("tr")).as("stt"))
      // b = (nΣtv − ΣtΣv) / (nΣt² − (Σt)²) on the exact integer sums;
      // a = (Σv − b·Σt′)/n in float AFTER b (the direct ΣvΣt² product
      // overflows BIGINT; this form never multiplies two big sums);
      // all-equal timestamps → zero denominator → no line
      .withColumn("den", (col("n") * col("stt") - col("st") * col("st")).cast("double"))
      .filter(col("den") =!= 0.0)
      .withColumn("b",
        (col("n") * col("stv") - col("st") * col("sv")).cast("double") /
          col("den") / 1e6)
      .select(col("path"), col("t0"), col("b"),
        ((col("sv").cast("double") / 1e6 - col("b") * col("st").cast("double")) /
          col("n").cast("double")).as("a"))
    frame(f.join(broadcast(fit), Seq("path"), "left"),
      wrap("linearRegression", ""), col("t"),
      col("a") + col("b") * (col("t") - col("t0")))
  }

  /** Trailing n-point MEDIAN (Graphite `movingMedian`) — the robust
    * smoother spikes cannot drag: the window's non-null values sort
    * in-row (`collect_list` drops nulls; the frame is bounded by n)
    * and the DISCRETE clamped-rank rule picks element
    * max(1, min(cnt, ⌊(cnt+1)/2⌋)) — an integer selection, so both
    * engines pick the identical stored double (the nPercentile
    * discipline applied inside the window). An all-null window is
    * null.
    */
  def movingMedian(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingMedian window must be >= 1 (got $n)")
    val w = byPath.rowsBetween(-(n - 1), 0)
    val arr = array_sort(collect_list(col("value")).over(w))
    val cnt = size(arr)
    val idx = greatest(lit(1), least(cnt,
      floor(lit(0.5) * (cnt + 1)).cast("int")))
    frame(f, wrap("movingMedian", n.toString), col("t"),
      when(cnt > 0, element_at(arr, idx)))
  }

  /** Graphite `weightedAverage(seriesListAvg, seriesListWeight, node)`:
    * the two lists matched by one path component, the per-timestamp
    * weighted mean Σ aᵢ·wᵢ / Σ wᵢ over matched pairs — THE way to
    * average per-host latencies weighted by per-host traffic. A
    * weight only counts when its value is present (both-present
    * pairs, graphite's safe rule); zero/absent weight mass → null.
    * One equi-join on (node, t) + one groupBy(t) — both map-side
    * combined.
    */
  def weightedAverage(fa: DataFrame, fw: DataFrame, node: Int,
                      name: String): DataFrame = {
    def keyed(df: DataFrame, vcol: String) = df.select(
      element_at(split(col("path"), "\\."),
        if (node >= 0) node + 1 else node).as("k"),
      col("t"), col("value").as(vcol))
    keyed(fa, "va").join(keyed(fw, "vw"), Seq("k", "t"))
      .groupBy(col("t"))
      .agg(sum(col("va") * col("vw")).as("num"),
        sum(when(col("va").isNotNull, col("vw"))).as("den"))
      .select(lit(name).as("path"), col("t"),
        when(col("den") =!= 0, col("num") / col("den")).as("value"))
  }

  /** Gaps filled with the last seen value per series; leading gaps
    * (nothing seen yet) stay null (Graphite `keepLastValue` with no
    * limit — the same last-hold rule as [[Fetch.fillGaps]]).
    */
  def keepLastValue(f: DataFrame): DataFrame =
    frame(f, wrap("keepLastValue", ""), col("t"),
      last(col("value"), ignoreNulls = true)
        .over(byPath.rowsBetween(Window.unboundedPreceding, 0)))

  /** Every timestamp shifted by `sec` (Graphite `timeShift` as a frame
    * combinator: the shift re-labels the fetched window rather than
    * re-fetching — callers wanting data from the shifted window fetch
    * with shifted from/until, as graphite-web does internally).
    */
  def timeShift(f: DataFrame, sec: Long, shiftText: String): DataFrame =
    frame(f, wrap("timeShift", "\"" + shiftText + "\""),
      col("t") + sec, col("value"))

  /** Running total that RESETS at each interval boundary (Graphite
    * `integralByInterval`) — the per-day/per-hour odometer: one window
    * over (path, bucket) ordered by t, no new shuffle class beyond the
    * sequence family's path partitioning.
    */
  def integralByInterval(f: DataFrame, intervalSec: Long,
                         intervalText: String): DataFrame = {
    require(intervalSec >= 1, s"integralByInterval interval must be >= 1s (got $intervalSec)")
    val bucket = col("t") - col("t") % intervalSec
    val w = Window.partitionBy(col("path"), bucket).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    frame(f, wrap("integralByInterval", "\"" + intervalText + "\""), col("t"),
      when(col("value").isNotNull, sum(col("value")).over(w)))
  }

  /** Graphite `hitcount(series, interval)`: rate × duration summed per
    * interval-aligned bucket — converts a per-second rate series into
    * event COUNTS per bucket. The per-point duration is the grid step
    * derived from the timestamps themselves (t − lag(t), the perSecond
    * rule, so irregular archives keep correct mass); a first point has
    * no step and contributes nothing, an all-null bucket is null. One
    * window + one map-side-combined groupBy.
    */
  def hitcount(f: DataFrame, intervalSec: Long,
               intervalText: String): DataFrame = {
    require(intervalSec >= 1, s"hitcount interval must be >= 1s (got $intervalSec)")
    val dt = col("t") - lag(col("t"), 1).over(byPath)
    val contrib = f.withColumn("hc", col("value") * dt)
    contrib
      .groupBy(col("path"), (col("t") - col("t") % intervalSec).as("t"))
      .agg(sum(col("hc")).as("value"))
      .select(concat(lit("hitcount("), col("path"),
        lit(s""", "$intervalText")""")).as("path"),
        col("t"), col("value").cast("double").as("value"))
  }

  // ---- time re-bucketing: one groupBy(path, bucket) shuffle ----

  /** Graphite `summarize(series, interval, func)`: interval-aligned
    * buckets (t − t mod interval), per-bucket sum/avg/max/min/last;
    * `last` takes the latest NON-NULL point in the bucket; an all-gap
    * bucket is null. One map-side-combined aggregation.
    */
  def summarize(f: DataFrame, intervalSec: Long, func: String,
                intervalText: String): DataFrame = {
    require(intervalSec >= 1, s"summarize interval must be >= 1s (got $intervalSec)")
    val agg: Column = func match {
      case "sum" => sum(col("value"))
      case "avg" | "average" => avg(col("value"))
      case "max" => max(col("value"))
      case "min" => min(col("value"))
      case "last" => max(when(col("value").isNotNull,
        struct(col("t"), col("value")))).getField("value")
      case other => throw new IllegalArgumentException(s"summarize: unknown func '$other'")
    }
    f.groupBy(col("path"), (col("t") - col("t") % intervalSec).as("t"))
      .agg(agg.cast("double").as("value"))
      .select(concat(lit("summarize("), col("path"),
        lit(s""", "$intervalText", "$func")""")).as("path"),
        col("t"), col("value"))
  }

  // ---- series selection: rank whole series, keep top n ----

  /** Top-n series by a per-series statistic (Graphite
    * `highestCurrent` / `highestAverage` / `highestMax`): `current` is
    * the last non-null value. Series keep their own names; ties break
    * by path for engine-stable selection. One aggregate over the frame
    * (K series rows) broadcast back — never a sort of the frame.
    */
  def highest(f: DataFrame, n: Int, stat: String): DataFrame = {
    require(n >= 1, s"highest: n must be >= 1 (got $n)")
    val statAgg: Column = stat match {
      case "current" => max(when(col("value").isNotNull,
        struct(col("t"), col("value")))).getField("value")
      case "average" => avg(col("value"))
      case "max" => max(col("value"))
      case other => throw new IllegalArgumentException(s"highest: unknown stat '$other'")
    }
    // rank on round(stat, 6): raw doubles could differ between engines
    // in the last ulp (accumulation order), and the path tie-break then
    // decides — the ANN-family ranking discipline
    val ranked = f.groupBy(col("path")).agg(statAgg.as("s"))
      .select(col("path"), row_number().over(
        Window.orderBy(round(col("s"), 6).desc_nulls_last, col("path"))).as("rk"))
      .filter(col("rk") <= n)
      .select(col("path"))
    // the ranked list is ≤ n rows — broadcast semi join, no shuffle of
    // the frame
    f.join(broadcast(ranked), Seq("path"), "left_semi")
  }

  def highestCurrent(f: DataFrame, n: Int): DataFrame = highest(f, n, "current")
  def highestAverage(f: DataFrame, n: Int): DataFrame = highest(f, n, "average")
  def highestMax(f: DataFrame, n: Int): DataFrame = highest(f, n, "max")

  /** Bottom-n twin of [[highest]] (Graphite `lowestCurrent` /
    * `lowestAverage`): same K-row stat rank, ascending, nulls last so
    * an all-gap series never wins "lowest".
    */
  def lowest(f: DataFrame, n: Int, stat: String): DataFrame = {
    require(n >= 1, s"lowest: n must be >= 1 (got $n)")
    val statAgg: Column = stat match {
      case "current" => max(when(col("value").isNotNull,
        struct(col("t"), col("value")))).getField("value")
      case "average" => avg(col("value"))
      case "min" => min(col("value"))
      case other => throw new IllegalArgumentException(s"lowest: unknown stat '$other'")
    }
    val ranked = f.groupBy(col("path")).agg(statAgg.as("s"))
      .select(col("path"), row_number().over(
        Window.orderBy(round(col("s"), 6).asc_nulls_last, col("path"))).as("rk"))
      .filter(col("rk") <= n)
      .select(col("path"))
    f.join(broadcast(ranked), Seq("path"), "left_semi")
  }

  def lowestCurrent(f: DataFrame, n: Int): DataFrame = lowest(f, n, "current")
  def lowestAverage(f: DataFrame, n: Int): DataFrame = lowest(f, n, "average")

  /** Graphite `mostDeviant(series, n)`: top-n series by population
    * variance — the same explicit moment formula as [[stdev]]
    * ((Σv² − (Σv)²/cnt)/cnt over non-null points) so the oracle
    * replays the identical float expression; rank on the round(,6)
    * grid with path tie-break, broadcast semi back, never a frame
    * sort.
    */
  def mostDeviant(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"mostDeviant: n must be >= 1 (got $n)")
    val cnt = count(col("value"))
    val s = sum(col("value"))
    val s2 = sum(col("value") * col("value"))
    val ranked = f.groupBy(col("path"))
      .agg(when(cnt > 0,
        (s2 - s * s / cnt) / cnt).as("v"))
      .select(col("path"), row_number().over(
        Window.orderBy(round(col("v"), 6).desc_nulls_last, col("path"))).as("rk"))
      .filter(col("rk") <= n)
      .select(col("path"))
    f.join(broadcast(ranked), Seq("path"), "left_semi")
  }

  /** Graphite `aliasSub(series, search, replace)`: paths rewritten by
    * a regex substitution — map-only. Patterns stay in the
    * Java∩RE2 dialect (the F22 discipline) so the oracle's
    * regexp_replace agrees; `$1`-style backreferences are Java-side
    * only and out of the oracle contract.
    */
  def aliasSub(f: DataFrame, search: String, replace: String): DataFrame =
    frame(f, regexp_replace(col("path"), search, replace),
      col("t"), col("value"))

  /** Graphite interval strings: `"1hour"`, `"30min"`, `"10s"`, `"1d"`
    * — number + unit prefix (graphite's parseTimeOffset unit table).
    */
  def parseInterval(s: String): Long = {
    val m = """^(\d+)\s*([a-z]*)$""".r
    s.trim.toLowerCase match {
      case m(n, u) =>
        val unit = u match {
          case "" | "s" | "sec" | "second" | "seconds" => 1L
          case "min" | "minute" | "minutes" => 60L
          case "h" | "hour" | "hours" => 3600L
          case "d" | "day" | "days" => 86400L
          case "w" | "week" | "weeks" => 7L * 86400L
          case "y" | "year" | "years" => 365L * 86400L
          case other => throw new IllegalArgumentException(s"unknown interval unit '$other'")
        }
        n.toLong * unit
      case other => throw new IllegalArgumentException(s"bad interval '$other'")
    }
  }

  /** Number rendering for wrapped names: integral doubles print
    * without the trailing `.0` (Graphite prints `scale(x,2)`).
    */
  private[tsdb] def fmtNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else String.format(java.util.Locale.ROOT, "%s", Double.box(v))
}
