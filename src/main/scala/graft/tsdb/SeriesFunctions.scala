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

  /** ONE canonical name per aggregate callback, shared by every
    * grouped combiner (combine / aggregateSeries / groupByNode /
    * groupByNodes): graphite accepts both the short callback name and
    * the `*Series` function alias, and all four entry points must
    * agree on coverage — re-implementing the table per function is
    * exactly how callbacks like "range" end up valid in one and
    * throwing in another.
    */
  private[tsdb] def canonAgg(func: String, ctx: String): String = func match {
    case "sum" | "total" | "sumSeries" => "sum"
    case "avg" | "average" | "averageSeries" => "avg"
    case "min" | "minSeries" => "min"
    case "max" | "maxSeries" => "max"
    case "count" | "countSeries" => "count"
    case "range" | "rangeOf" | "rangeOfSeries" => "range"
    case "stddev" | "stddevSeries" => "stddev"
    case other => throw new IllegalArgumentException(s"$ctx: unknown func '$other'")
  }

  /** The single aggregate-Column source behind [[canonAgg]]'s names —
    * arithmetic lives here ONCE so per-t combiners and per-(key,t)
    * rollups can't drift.
    */
  private[tsdb] def aggExpr(canon: String): Column = canon match {
    case "sum" => sum(col("value"))
    case "avg" => avg(col("value"))
    case "min" => min(col("value"))
    case "max" => max(col("value"))
    // count counts SERIES PRESENT (non-null values) at each point —
    // Graphite's len(row), constant only on gap-free frames
    case "count" => count(col("value"))
    // range: spread across series at each point
    case "range" => max(col("value")) - min(col("value"))
    // stddev: population deviation ACROSS series per point, the
    // explicit moment formula (the stdev discipline) so the oracle
    // replays the same float expression
    case "stddev" =>
      when(count(col("value")) > 0,
        sqrt(greatest(lit(0.0),
          (sum(col("value") * col("value")) -
            sum(col("value")) * sum(col("value")) / count(col("value"))) /
            count(col("value")))))
  }

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
    val agg = aggExpr(canonAgg(func, "combine"))
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
    // the one shared stat table (the canonAgg single-sourcing rule)
    val statAgg: Column = seriesStat(stat, "filterByStat")
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

  /** Graphite 1.1 `sortBy(seriesList[, func[, reverse]])` — the
    * GENERIC ordering form the named sortBy* family specializes:
    * ascending by the callback's per-series value (graphite's
    * default), `reverse` flips. Same K-row rank-tag + broadcast shape;
    * the callback comes from the one shared [[seriesStat]] table, so
    * "total"/"stddev"/"count"/"range"/"current" all order here exactly
    * as they select in highest/lowest.
    */
  def sortBySeries(f: DataFrame, func: String, reverse: Boolean): DataFrame =
    sortBySeriesStat(f, seriesStat(func, "sortBy"), descending = reverse)

  /** Graphite `reduceSeries(mapSeries(seriesList, n), "func", n,
    * *matchers)` — the matcher-pairing composition idiom (the
    * documented per-host `asPercent(bytes_used, total_bytes)` recipe):
    * series split at node `reduceNode` into (prefix = nodes before,
    * suffix = nodes from there on); for every prefix, the series whose
    * suffix equals matcher₁ combines with the matcher₂ one under
    * `func` (asPercent / divideSeries / diffSeries — graphite's
    * documented set), and the result is named BY THE PREFIX (graphite
    * aliases the reduced series to the aggregated key so they nest).
    * Missing-side law — deliberately ASYMMETRIC, matcher order is
    * meaningful: a prefix missing the matcher₂ side behaves as the
    * func's null law (divide/percent → null, diff subtracts 0); a
    * prefix with NO matcher₁ series is DROPPED entirely (the result
    * set is the matcher₁ side — there is no numerator to reduce).
    * graphite-web's own reduceSeries passes a None placeholder into
    * the reduce function in that case (an error, not a series), so
    * the drop is this engine's defined replacement for graphite's
    * undefined behavior — pinned by spec. One left equi-join on
    * (prefix, t) — plan size independent of the prefix count, the
    * applyByNode discipline.
    *
    * `mapSeries` itself is the identity in the frame model — the
    * grouping it declares is re-derived here from `reduceNode`, so the
    * pair parses and composes exactly as graphite-web's, with the
    * grouping applied once (the evaluator registers mapSeries as a
    * pass-through).
    */
  def reduceSeries(f: DataFrame, func: String, reduceNode: Int,
                   matchers: Seq[String]): DataFrame = {
    require(reduceNode >= 1, s"reduceSeries: reduceNode must be >= 1 (got $reduceNode)")
    require(matchers.length == 2,
      s"reduceSeries: expected exactly 2 matchers (got ${matchers.length})")
    val parts = split(col("path"), "\\.")
    val prefix = array_join(slice(parts, 1, reduceNode), ".")
    val suffix = array_join(
      slice(parts, lit(reduceNode + 1),
        greatest(size(parts) - reduceNode, lit(0))),
      ".")
    val keyed = f.select(prefix.as("gkey"), suffix.as("sfx"),
      col("t"), col("value"))
    val a = keyed.filter(col("sfx") === matchers(0))
      .groupBy(col("gkey"), col("t")).agg(sum(col("value")).as("av"))
    val b = keyed.filter(col("sfx") === matchers(1))
      .groupBy(col("gkey"), col("t")).agg(sum(col("value")).as("bv"))
    val v = func match {
      case "divideSeries" => when(col("bv") =!= 0, col("av") / col("bv"))
      case "asPercent" => when(col("bv") =!= 0, col("av") / col("bv") * 100.0)
      case "diffSeries" => col("av") - coalesce(col("bv"), lit(0.0))
      case other =>
        throw new IllegalArgumentException(s"reduceSeries: unknown func '$other'")
    }
    a.join(b, Seq("gkey", "t"), "left")
      .select(col("gkey").as("path"), col("t"), v.cast("double").as("value"))
  }

  /** Graphite `removeEmptySeries(seriesList[, xFilesFactor])` — drop
    * series with no data at all (the default), or whose non-null
    * fraction falls below xff: the dashboard-hygiene filter that keeps
    * a 500-series glob from rendering 400 empty lines. K-row
    * (non-null, total) counts + broadcast semi; names untouched
    * (graphite does not wrap here). The xff comparison is the single
    * float expression `nn >= xff·n`, identical in both engines.
    */
  def removeEmptySeries(f: DataFrame, xff: Double = 0.0): DataFrame = {
    require(xff >= 0.0 && xff <= 1.0,
      s"removeEmptySeries: xFilesFactor must be in [0,1] (got $xff)")
    val keep = f.groupBy(col("path"))
      .agg(count(col("value")).as("nn"), count(lit(1)).as("n"))
      .filter(col("nn") > 0 &&
        col("nn").cast("double") >= lit(xff) * col("n").cast("double"))
      .select(col("path"))
    f.join(broadcast(keep), Seq("path"), "left_semi")
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

  /** Graphite `sortByName(seriesList[, natural[, reverse]])`: series
    * in name order — the rank tag makes the order explicit for
    * `limit`/legend consumers. `natural=true` compares digit runs
    * NUMERICALLY ("s2" before "s10", graphite's re.split('(\\d+)')
    * int-vs-str key): the sort key lpads every digit run to 20 chars
    * (inserted-separator split — RE2-portable, no lookarounds — so the
    * DuckDB oracle replays the identical key), making plain string
    * order equal natural order; digits sort before letters (ASCII),
    * and the raw path tie-breaks keys that collide under padding
    * ("s02" vs "s2").
    */
  def sortByName(f: DataFrame, natural: Boolean = false,
                 reverse: Boolean = false): DataFrame = {
    val key =
      if (!natural) col("path")
      else array_join(transform(
        split(regexp_replace(col("path"), "([0-9]+)", "\u0001$1\u0001"),
          "\u0001"),
        t => when(t.rlike("^[0-9]+$"), lpad(t, 20, "0")).otherwise(t)), "")
    val w = Window.orderBy(
      (if (reverse) Seq(key.desc, col("path").desc)
       else Seq(key.asc, col("path").asc)): _*)
    val ranked = f.select(col("path")).distinct()
      .select(col("path"), row_number().over(w).as("ord"))
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
    g.groupBy(col("path"), col("t"))
      .agg(aggExpr(canonAgg(func, "groupByNode")).cast("double").as("value"))
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

  /** Counter-wrap recovery (Graphite `nonNegativeDerivative(series,
    * maxValue)`) — the network-counter idiom: a negative step where
    * the current reading fits under the counter's ceiling reads as a
    * WRAP, delta = maxValue − prev + curr + 1 (the counter ran to
    * maxValue, rolled to 0, and climbed to curr); a negative step
    * ABOVE the ceiling is still a reset → null. Same name as the
    * no-maxValue form (graphite doesn't render the ceiling).
    */
  def nonNegativeDerivative(f: DataFrame, maxValue: Double): DataFrame = {
    val prev = lag(col("value"), 1).over(byPath)
    val d = col("value") - prev
    frame(f, wrap("nonNegativeDerivative", ""), col("t"),
      when(d >= 0, d)
        .when(lit(maxValue) >= col("value"),
          lit(maxValue) - prev + col("value") + 1))
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

  /** `perSecond(series, maxValue)` — [[perSecond]] with the same
    * wrap-delta recovery as [[nonNegativeDerivative]]'s maxValue form,
    * divided by the step.
    */
  def perSecond(f: DataFrame, maxValue: Double): DataFrame = {
    val prev = lag(col("value"), 1).over(byPath)
    val d = col("value") - prev
    val dt = col("t") - lag(col("t"), 1).over(byPath)
    frame(f, wrap("perSecond", ""), col("t"),
      when(d >= 0 && dt > 0, d / dt)
        .when(lit(maxValue) >= col("value") && dt > 0,
          (lit(maxValue) - prev + col("value") + 1) / dt))
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
  def nPercentile(f: DataFrame, p: Double): DataFrame =
    frame(f.join(broadcast(seriesPercentile(f, p)), Seq("path"), "left"),
      wrap("nPercentile", fmtNum(p)), col("t"), col("pv"))

  /** Per-series discrete percentile value (path, pv): the clamped-rank
    * selection rule shared by [[nPercentile]] and the
    * removeAbove/BelowPercentile gates — rank = clamp(⌊p/100·(n+1)⌋,
    * [1, n]) over each series' sorted non-null values, an integer pick
    * of a stored double, so both engines select the identical value.
    */
  private def seriesPercentile(f: DataFrame, p: Double): DataFrame = {
    require(p > 0 && p <= 100, s"percentile p must be in (0,100] (got $p)")
    val wv = Window.partitionBy(col("path")).orderBy(col("value"), col("t"))
    val wp = Window.partitionBy(col("path"))
    f.filter(col("value").isNotNull)
      .select(col("path"), col("value"),
        row_number().over(wv).as("rn"), count(lit(1)).over(wp).as("cnt"))
      // rank clamped to [1, cnt]: p=100 selects the max instead of
      // overrunning the list (graphite's unclamped rule would index
      // past the end there)
      .filter(col("rn") === greatest(lit(1L), least(col("cnt"),
        floor(lit(p / 100.0) * (col("cnt") + 1)).cast("long"))))
      .select(col("path"), col("value").as("pv"))
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
                          seasonText: String): DataFrame =
    frame(holtWintersFit(f, seasonPts),
      concat(lit("holtWintersForecast("), col("path"),
        lit(s""","$seasonText")""")),
      col("t"), col("fc"))

  /** The shared Holt-Winters fold — one pass producing, per grid
    * point, the PRE-UPDATE forecast `fc` and seasonal deviation `dk`
    * (γ-smoothed |actual − forecast| ring slot, graphite's
    * holtWintersAnalysis deviation) alongside presence and the raw
    * value. [[holtWintersForecast]], [[holtWintersConfidenceBands]]
    * and [[holtWintersAberration]] are projections of this ONE float
    * sequence, so forecast, bands and aberration can never disagree
    * about the model state — and the WITH RECURSIVE oracles replay
    * the identical sequence with a second (dev) ring. Deviation rule
    * (pinned in both engines): dev'[k] = γ·|v − fc| + (1−γ)·dev[k]
    * when the point is present and a forecast exists; gaps and the
    * pre-seed prefix leave the ring untouched (the season-ring rules
    * applied to the error channel).
    */
  private def holtWintersFit(f: DataFrame, seasonPts: Int): DataFrame = {
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
        zeros.as("season"), zeros.as("dev"),
        array().cast(
          "array<struct<t:bigint,present:boolean,v:double,fc:double,dk:double>>")
          .as("out")),
      (acc, x) => {
        val i = size(acc.getField("out"))
        val k = pmod(i, lit(L))                      // 0-based ring slot
        val sk = element_at(acc.getField("season"), k + 1)
        val dk = element_at(acc.getField("dev"), k + 1)
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
        // deviation ring: absolute forecast error, γ-smoothed at this
        // slot; fc is non-null whenever lvl is (pre-seed rows hold)
        val dkN = lit(gamma) * abs(v - fc) + lit(1 - gamma) * dk
        val devN = when(!present || lvl.isNull, acc.getField("dev"))
          .otherwise(concat(
            slice(acc.getField("dev"), lit(1), k),
            array(dkN),
            slice(acc.getField("dev"), k + 2, lit(L) - k - 1)))
        struct(lvlN.as("lvl"), trdN.as("trd"), seasonN.as("season"),
          devN.as("dev"),
          concat(acc.getField("out"), array(struct(
            x.getField("t").as("t"), present.as("present"), v.as("v"),
            fc.as("fc"), dk.as("dk")))).as("out"))
      },
      acc => acc.getField("out"))
    pts.select(col("path"), explode(folded).as("e"))
      .select(col("path"), col("e.t").as("t"), col("e.present").as("present"),
        col("e.v").as("v"), col("e.fc").as("fc"), col("e.dk").as("dk"))
  }

  /** Graphite `holtWintersConfidenceBands(series, delta)`: the
    * forecast envelope — upper/lower = fc ± δ·dev[k], one pair of
    * output series per input series (graphite's
    * holtWintersConfidenceUpper/Lower naming). Both bands come out of
    * ONE fold pass via a 2-row in-row explode — the fit is never
    * evaluated twice. Null until the forecast seeds (fc null
    * dominates the ± arithmetic), including at gap points where the
    * envelope still draws (state held, forecast emitted — the
    * forecast rules).
    */
  def holtWintersConfidenceBands(f: DataFrame, seasonPts: Int,
                                 delta: Double): DataFrame = {
    val fit = holtWintersFit(f, seasonPts)
    val branches = explode(array(
      struct(lit("holtWintersConfidenceUpper").as("nm"),
        (col("fc") + lit(delta) * col("dk")).as("bv")),
      struct(lit("holtWintersConfidenceLower").as("nm"),
        (col("fc") - lit(delta) * col("dk")).as("bv"))))
    fit.select(col("path"), col("t"), branches.as("b"))
      .select(concat(col("b.nm"), lit("("), col("path"), lit(")")).as("path"),
        col("t"), col("b.bv").as("value"))
  }

  /** Graphite `holtWintersAberration(series, delta)`: how far each
    * actual point escapes the confidence envelope — v − upper above,
    * v − lower below (negative), 0 inside; gaps and the pre-seed
    * prefix are 0 (graphite emits 0, not null — an aberration series
    * feeds alerting thresholds, where null would read as "no data"
    * instead of "no anomaly").
    */
  def holtWintersAberration(f: DataFrame, seasonPts: Int,
                            delta: Double): DataFrame = {
    val fit = holtWintersFit(f, seasonPts)
    val upper = col("fc") + lit(delta) * col("dk")
    val lower = col("fc") - lit(delta) * col("dk")
    frame(fit,
      concat(lit("holtWintersAberration("), col("path"), lit(")")),
      col("t"),
      when(!col("present") || col("fc").isNull, lit(0.0))
        .when(col("v") > upper, col("v") - upper)
        .when(col("v") < lower, col("v") - lower)
        .otherwise(lit(0.0)))
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
  /** The ONE bucket-aggregate table summarize / smartSummarize /
    * summarize-alignToFrom share (the canonAgg single-sourcing rule
    * applied to the re-bucketing family; `last` needs the (t, value)
    * pick, so it lives here rather than in aggExpr).
    */
  private def bucketAgg(func: String, ctx: String): Column = func match {
    case "sum" => sum(col("value"))
    case "avg" | "average" => avg(col("value"))
    case "max" => max(col("value"))
    case "min" => min(col("value"))
    case "last" => max(when(col("value").isNotNull,
      struct(col("t"), col("value")))).getField("value")
    case other => throw new IllegalArgumentException(s"$ctx: unknown func '$other'")
  }

  def summarize(f: DataFrame, intervalSec: Long, func: String,
                intervalText: String): DataFrame = {
    require(intervalSec >= 1, s"summarize interval must be >= 1s (got $intervalSec)")
    f.groupBy(col("path"), (col("t") - col("t") % intervalSec).as("t"))
      .agg(bucketAgg(func, "summarize").cast("double").as("value"))
      .select(concat(lit("summarize("), col("path"),
        lit(s""", "$intervalText", "$func")""")).as("path"),
        col("t"), col("value"))
  }

  /** Graphite `summarize(series, interval, func, alignToFrom=true)` —
    * buckets aligned to the window start instead of the epoch grid:
    * the same per-series-min(t) anchor as [[smartSummarize]] (the
    * frame carries no fetch metadata, so the series' first grid point
    * IS the window start — the documented contract), but named the
    * way graphite names the 4-arg summarize form.
    */
  def summarizeAligned(f: DataFrame, intervalSec: Long, func: String,
                       intervalText: String): DataFrame = {
    require(intervalSec >= 1,
      s"summarize: interval must be >= 1s (got $intervalSec)")
    val t0 = min(col("t")).over(Window.partitionBy(col("path")))
    f.withColumn("b", col("t") - pmod(col("t") - t0, lit(intervalSec)))
      .groupBy(col("path"), col("b").as("t"))
      .agg(bucketAgg(func, "summarize").cast("double").as("value"))
      .select(concat(lit("summarize("), col("path"),
        lit(s""", "$intervalText", "$func", true)""")).as("path"),
        col("t"), col("value"))
  }

  /** Graphite `consolidateBy(seriesList, "func")` — sets the
    * CONSOLIDATION function the renderer applies when a series carries
    * more points than the client's `maxDataPoints`; the data itself is
    * untouched here (graphite stores the tag as a series attribute and
    * renames the series `consolidateBy(name,"func")`). The frame model
    * has no attribute channel besides the name, so the tag RIDES the
    * wrapped name — which is simultaneously the display name graphite
    * gives — and [[consolidate]] parses it back out. Map-only.
    */
  def consolidateBy(f: DataFrame, func: String): DataFrame = {
    val allowed = Set("sum", "average", "avg", "min", "max", "first", "last")
    require(allowed.contains(func),
      s"consolidateBy: unknown func '$func' (one of ${allowed.toSeq.sorted.mkString(",")})")
    frame(f, concat(lit("consolidateBy("), col("path"), lit(s""","$func")""")),
      col("t"), col("value"))
  }

  /** The renderer's `maxDataPoints` consolidation (graphite
    * render/datalib: `valuesPerPoint = ceil(len(series) /
    * maxDataPoints)`, points bucketed IN ROW ORDER in groups of that
    * factor, each bucket aggregated by the series' consolidation
    * function — the [[consolidateBy]] tag, default average; nulls are
    * dropped inside a bucket, an all-null bucket stays null; the
    * bucket keeps its FIRST timestamp, which on the dense fetch grid
    * is graphite's `start + i·step·factor`). A series already within
    * the budget passes through unchanged (factor 1 buckets are
    * singletons).
    *
    * Integer arithmetic throughout (`div`, not float division) so the
    * DuckDB oracle replays bucket boundaries exactly. One
    * groupBy(path, bucket) shuffle; at scale the frame is already
    * partitioned by path from the fetch, so AQE sees a local
    * aggregation. The six candidate aggregates all ride ONE pass —
    * dispatch happens per-GROUP on the parsed tag, not per-row.
    */
  def consolidate(f: DataFrame, maxDataPoints: Int): DataFrame = {
    require(maxDataPoints >= 1,
      s"consolidate: maxDataPoints must be >= 1 (got $maxDataPoints)")
    val wAll = Window.partitionBy(col("path"))
    val tagged = f
      .withColumn("rn", row_number().over(byPath))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("fct",
        ceil(col("n") / lit(maxDataPoints.toDouble)).cast("long"))
      .withColumn("b", expr("(rn - 1) div fct"))
    val fn = regexp_extract(col("path"),
      "consolidateBy\\(.*,\"(\\w+)\"\\)", 1)
    tagged.groupBy(col("path"), col("b"))
      .agg(
        min(col("t")).as("t"),
        avg(col("value")).as("c_avg"),
        sum(col("value")).as("c_sum"),
        min(col("value")).as("c_min"),
        max(col("value")).as("c_max"),
        min(when(col("value").isNotNull, struct(col("t"), col("value"))))
          .getField("value").as("c_first"),
        max(when(col("value").isNotNull, struct(col("t"), col("value"))))
          .getField("value").as("c_last"))
      .select(col("path"), col("t"),
        when(fn === "sum", col("c_sum"))
          .when(fn === "min", col("c_min"))
          .when(fn === "max", col("c_max"))
          .when(fn === "first", col("c_first"))
          .when(fn === "last", col("c_last"))
          .otherwise(col("c_avg")) // avg/average and the untagged default
          .cast("double").as("value"))
  }

  /** Graphite `smartSummarize(series, interval[, func])`: summarize
    * with buckets aligned to each series' own WINDOW START instead of
    * the epoch grid — "4hour" buckets begin at the first grid point,
    * not at 00:00/04:00/... wall-clock boundaries (graphite aligns to
    * series.start; the frame carries no fetch metadata, so the
    * per-series min(t) IS the window start — documented contract).
    * Same aggregate dispatch as [[summarize]]; one extra per-series
    * min window before the groupBy.
    */
  def smartSummarize(f: DataFrame, intervalSec: Long, func: String,
                     intervalText: String): DataFrame = {
    require(intervalSec >= 1, s"smartSummarize interval must be >= 1s (got $intervalSec)")
    val t0 = min(col("t")).over(Window.partitionBy(col("path")))
    f.withColumn("b", col("t") - pmod(col("t") - t0, lit(intervalSec)))
      .groupBy(col("path"), col("b").as("t"))
      .agg(bucketAgg(func, "smartSummarize").cast("double").as("value"))
      .select(concat(lit("smartSummarize("), col("path"),
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
  /** Per-series stat table for the GENERIC selection/ordering
    * functions (graphite 1.1 `highest`/`lowest`/`sortBy` take the
    * callback by name): the shared [[aggExpr]] table (sum/total, avg,
    * min, max, count, range, stddev — applied per series over time
    * instead of per timestamp across series; the Column is the same)
    * plus the position stats `current`/`last` that need the
    * latest-non-null pick. ONE table, so the generic forms and the
    * legacy named forms (highestCurrent, sortByTotal, ...) can't
    * drift.
    */
  private def seriesStat(stat: String, ctx: String): Column = stat match {
    case "current" | "last" => max(when(col("value").isNotNull,
      struct(col("t"), col("value")))).getField("value")
    case other => aggExpr(canonAgg(other, ctx))
  }

  def highest(f: DataFrame, n: Int, stat: String): DataFrame = {
    require(n >= 1, s"highest: n must be >= 1 (got $n)")
    val statAgg: Column = seriesStat(stat, "highest")
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
    val statAgg: Column = seriesStat(stat, "lowest")
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

  /** Graphite 1.1 `aliasByTags(series, *tags)`: each series renamed to
    * its tag VALUES joined with '.' (graphite routes aliasByTags
    * through aliasByNode's tag branch, '.'-joined); `name` is the
    * implicit metric-name tag, a missing tag contributes '' — map-only
    * string extraction over the path column, the aliasByMetric shape.
    */
  def aliasByTags(f: DataFrame, tags: Seq[String]): DataFrame =
    frame(f, concat_ws(".", tags.map(Tags.tagValueCol): _*),
      col("t"), col("value"))

  // ---- pointwise null/math transforms: map-only, ride the fetch scan ----

  /** Graphite `transformNull(series, default)`: gaps become `default`
    * — the "draw 0 instead of a hole" dashboard staple. Map-only.
    */
  def transformNull(f: DataFrame, default: Double): DataFrame =
    frame(f, wrap("transformNull", fmtNum(default)), col("t"),
      coalesce(col("value"), lit(default)))

  /** Graphite `isNonNull(series)`: 1 where a value exists, 0 at gaps
    * — the data-presence indicator summarize/integral turn into
    * uptime counts. Map-only.
    */
  def isNonNull(f: DataFrame): DataFrame =
    frame(f, wrap("isNonNull", ""), col("t"),
      when(col("value").isNotNull, lit(1.0)).otherwise(lit(0.0)))

  /** Graphite `logarithm(series, base)`: log_base(v); non-positive
    * points null out (graphite draws nothing there). ln(v)/ln(base) —
    * the identical two-float expression both engines evaluate.
    */
  def logarithm(f: DataFrame, base: Double): DataFrame = {
    require(base > 0 && base != 1.0, s"logarithm base must be > 0, != 1 (got $base)")
    frame(f, wrap("logarithm", fmtNum(base)), col("t"),
      when(col("value") > 0.0, log(col("value")) / math.log(base)))
  }

  /** Graphite `squareRoot(series)`: √v; negative points null out. */
  def squareRoot(f: DataFrame): DataFrame =
    frame(f, wrap("squareRoot", ""), col("t"),
      when(col("value") >= 0.0, sqrt(col("value"))))

  /** Graphite `pow(series, factor)`: v^factor. */
  def powSeries(f: DataFrame, factor: Double): DataFrame =
    frame(f, wrap("pow", fmtNum(factor)), col("t"),
      pow(col("value"), factor))

  /** Graphite `invert(series)`: 1/v; zero points null out (the same
    * divide-by-zero rule as divideSeries).
    */
  def invert(f: DataFrame): DataFrame =
    frame(f, wrap("invert", ""), col("t"),
      when(col("value") =!= 0.0, lit(1.0) / col("value")))

  /** Graphite `changed(series)`: 1 when the value differs from the
    * previous point's, else 0 — graphite's rule emits 0 unless BOTH
    * this point and the previous are present and unequal. One lag
    * window per series.
    */
  def changed(f: DataFrame): DataFrame = {
    val prev = lag(col("value"), 1).over(byPath)
    frame(f, wrap("changed", ""), col("t"),
      when(col("value").isNotNull && prev.isNotNull && col("value") =!= prev,
        lit(1.0)).otherwise(lit(0.0)))
  }

  /** Graphite `delay(series, steps)`: each point shows the value from
    * `steps` grid points earlier (the head is null) — the self-join
    * companion for "compare with N hours ago" arithmetic on one
    * window. One lag window per series; negative steps look ahead.
    */
  def delay(f: DataFrame, steps: Int): DataFrame =
    frame(f, wrap("delay", steps.toString), col("t"),
      lag(col("value"), steps).over(byPath))

  /** Graphite `substr(series, start[, stop])`: the path relabeled to a
    * dot-node slice [start, stop) — 0-based, stop 0 = to the end
    * (graphite's python-slice semantics on the split name). Map-only;
    * the aliasByNode machinery generalized to a range.
    */
  def substrSeries(f: DataFrame, start: Int, stop: Int): DataFrame = {
    val parts = split(col("path"), "\\.")
    val upto = if (stop == 0) size(parts) else least(lit(stop), size(parts))
    frame(f,
      concat_ws(".", slice(parts, lit(start + 1), greatest(upto - start, lit(0)))),
      col("t"), col("value"))
  }

  // ---- series math over two lists / percentile gates ----

  /** Graphite `diffSeries(minuend, subtrahend)`: minuend − safeSum of
    * the subtrahend list per timestamp; a missing subtrahend point
    * subtracts 0, a missing minuend point stays null (graphite's
    * safeDiff). PER-MINUEND naming, the divideSeries rule.
    */
  def diffSeries(f: DataFrame, sub: DataFrame, subText: String): DataFrame = {
    val s = sub.groupBy(col("t")).agg(sum(col("value")).as("sv"))
    frame(f.join(broadcast(s), Seq("t"), "left"),
      concat(lit("diffSeries("), col("path"), lit(s",$subText)")),
      col("t"), col("value") - coalesce(col("sv"), lit(0.0)))
  }

  /** Graphite `multiplySeries(seriesList)`: per-timestamp product
    * across the list; any missing input point nulls the product
    * (graphite's safeMul needs every factor). The product itself is
    * DuckDB's product() aggregate on the oracle side — float multiply
    * is order-sensitive only in the last ulps, absorbed by the shared
    * Eps+round discipline exactly like the stddevSeries moment sums.
    */
  def multiplySeries(f: DataFrame, name: String): DataFrame =
    f.groupBy(col("t"))
      .agg(count(lit(1)).as("n"), count(col("value")).as("nn"),
        sort_array(collect_list(struct(col("path"), col("value")))).as("vs"))
      .select(lit(name).as("path"), col("t"),
        when(col("nn") === col("n") && col("n") > 0,
          aggregate(col("vs"), lit(1.0), (acc, x) => acc * x.getField("value")))
          .as("value"))

  /** Graphite `removeAbovePercentile(series, p)`: points above the
    * series' own p-th percentile (the [[seriesPercentile]] discrete
    * pick) null out — the robust outlier clip.
    */
  def removeAbovePercentile(f: DataFrame, p: Double): DataFrame =
    frame(f.join(broadcast(seriesPercentile(f, p)), Seq("path"), "left"),
      wrap("removeAbovePercentile", fmtNum(p)), col("t"),
      when(col("value") <= col("pv"), col("value")))

  /** Graphite `removeBelowPercentile(series, p)`: the mirror gate. */
  def removeBelowPercentile(f: DataFrame, p: Double): DataFrame =
    frame(f.join(broadcast(seriesPercentile(f, p)), Seq("path"), "left"),
      wrap("removeBelowPercentile", fmtNum(p)), col("t"),
      when(col("value") >= col("pv"), col("value")))

  /** Graphite `percentileOfSeries(seriesList, p)`: ONE output series
    * whose point at t is the p-th percentile ACROSS the input series'
    * values at t — the same clamped discrete rank as [[nPercentile]],
    * applied per timestamp instead of per series (an integer pick of
    * a stored double; all-null timestamps stay null). One groupBy(t)
    * shuffle, in-row sort of a K-value list.
    */
  def percentileOfSeries(f: DataFrame, p: Double, name: String): DataFrame = {
    require(p > 0 && p <= 100, s"percentileOfSeries: p must be in (0,100] (got $p)")
    val arr = array_sort(collect_list(col("value")))
    f.groupBy(col("t")).agg(arr.as("arr"))
      .select(lit(name).as("path"), col("t"),
        when(size(col("arr")) > 0, element_at(col("arr"),
          greatest(lit(1), least(size(col("arr")),
            floor(lit(p / 100.0) * (size(col("arr")) + 1)).cast("int")))))
          .as("value"))
  }

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
  // ---- r7 batch 5: window min/max, gap interpolation, time slicing,
  //      rate re-scaling, stat lines, wildcard merge, percentile-band
  //      series selection ----

  /** Trailing n-point minimum (Graphite `movingMin`): null-ignoring
    * window aggregate, all-null window → null — the movingSum shape
    * with `min`.
    */
  /** Graphite 1.1 `movingWindow(seriesList, windowSize, func)` — the
    * generic front-end the named moving* family specializes; pure
    * dispatch, so the five windows can never drift from their named
    * forms ("avg"/"average"/"median"/"sum"/"min"/"max", graphite's
    * spellings).
    */
  def movingWindow(f: DataFrame, n: Int, func: String): DataFrame =
    func match {
      case "avg" | "average" => movingAverage(f, n)
      case "sum" | "total" => movingSum(f, n)
      case "min" => movingMin(f, n)
      case "max" => movingMax(f, n)
      case "median" => movingMedian(f, n)
      case other =>
        throw new IllegalArgumentException(s"movingWindow: unknown func '$other'")
    }

  /** The moving* family with a TIME windowSize (`movingAverage(x,
    * "10min")` — the form Grafana's query editor emits): a trailing
    * RANGE window over the timestamp column, rangeBetween(−(sec−1), 0)
    * = the points in (t−sec, t]. On the dense step-s grid this is
    * exactly sec/s trailing points — the int form's reading — but
    * expressed time-natively, so it needs no step metadata (the frame
    * carries none, the C10 contract) and stays correct on
    * consolidated/irregular grids. Names carry the QUOTED interval
    * text, graphite's rendering for string windowSizes. Same window
    * discipline as the int forms: aggregates ignore nulls, an all-null
    * window is null, median is the sorted clamped-rank pick.
    */
  def movingWindowTime(f: DataFrame, sec: Long, text: String,
                       func: String): DataFrame = {
    require(sec >= 1, s"moving window interval must be >= 1s (got $sec)")
    val w = byPath.rangeBetween(-(sec - 1), 0)
    val (fn, v): (String, Column) = func match {
      case "avg" | "average" => ("movingAverage", avg(col("value")).over(w))
      case "sum" | "total" => ("movingSum", sum(col("value")).over(w))
      case "min" => ("movingMin", min(col("value")).over(w))
      case "max" => ("movingMax", max(col("value")).over(w))
      case "median" =>
        val arr = array_sort(collect_list(col("value")).over(w))
        val cnt = size(arr)
        val idx = greatest(lit(1), least(cnt,
          floor(lit(0.5) * (cnt + 1)).cast("int")))
        ("movingMedian", when(cnt > 0, element_at(arr, idx)))
      case other =>
        throw new IllegalArgumentException(
          s"movingWindow: unknown func '$other'")
    }
    frame(f, wrap(fn, "\"" + text + "\""), col("t"), v)
  }

  def movingMin(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingMin window must be >= 1 (got $n)")
    frame(f, wrap("movingMin", n.toString), col("t"),
      min(col("value")).over(byPath.rowsBetween(-(n - 1), 0)))
  }

  /** Trailing n-point maximum (Graphite `movingMax`). */
  def movingMax(f: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"movingMax window must be >= 1 (got $n)")
    frame(f, wrap("movingMax", n.toString), col("t"),
      max(col("value")).over(byPath.rowsBetween(-(n - 1), 0)))
  }

  /** Linear gap fill (Graphite `interpolate`): a null run between two
    * non-null neighbours fills linearly by TIMESTAMP (not row index —
    * identical here on dense grids, but the law is the honest one);
    * leading/trailing nulls have no neighbour on one side and stay
    * null. Two null-skipping windows per series (previous / next
    * non-null (t, value)), then pure per-row arithmetic — no join, one
    * path-keyed window shuffle like every sequence function.
    */
  def interpolate(f: DataFrame): DataFrame = interpolateImpl(f, None)

  /** `interpolate(seriesList, limit)` — graphite's bounded form: only
    * gaps of at most `limit` CONSECUTIVE nulls bridge; longer outages
    * stay broken (the keepLastValue(limit) rationale — interpolating
    * across a dead host invents data). Gap length is row-position
    * arithmetic (next non-null rn − last non-null rn − 1, the
    * keepLastValue machinery); graphite keeps the unlimited name.
    */
  def interpolate(f: DataFrame, limit: Int): DataFrame = {
    require(limit >= 1, s"interpolate: limit must be >= 1 (got $limit)")
    interpolateImpl(f, Some(limit))
  }

  private def interpolateImpl(f: DataFrame, limit: Option[Int]): DataFrame = {
    val wp = byPath.rowsBetween(Window.unboundedPreceding, -1)
    val wn = byPath.rowsBetween(1, Window.unboundedFollowing)
    val tagged = f.withColumn("rn", row_number().over(byPath))
    val pv = last(col("value"), ignoreNulls = true).over(wp)
    val pt = last(when(col("value").isNotNull, col("t")), ignoreNulls = true).over(wp)
    val nv = first(col("value"), ignoreNulls = true).over(wn)
    val nt = first(when(col("value").isNotNull, col("t")), ignoreNulls = true).over(wn)
    val bridged = pv + (nv - pv) * (col("t") - pt) / (nt - pt)
    val gapOk = limit match {
      case None => lit(true)
      case Some(lim) =>
        // run length from non-null ROW positions; a missing side
        // (leading/trailing run) reads null → the gate fails → null,
        // which the one-sided bridge arithmetic would yield anyway
        val li = last(when(col("value").isNotNull, col("rn")),
          ignoreNulls = true).over(wp)
        val ni = first(when(col("value").isNotNull, col("rn")),
          ignoreNulls = true).over(wn)
        ni - li - 1 <= lim
    }
    frame(tagged, wrap("interpolate", ""), col("t"),
      when(col("value").isNotNull, col("value"))
        .otherwise(when(gapOk, bridged)))
  }

  /** Keep only points with startT ≤ t ≤ endT (Graphite `timeSlice`;
    * this form takes epoch seconds — the target grammar's number
    * argument). The grid stays, outside points null — map-only.
    */
  def timeSlice(f: DataFrame, startT: Long, endT: Long): DataFrame =
    frame(f, wrap("timeSlice", s"$startT,$endT"), col("t"),
      when(col("t") >= startT && col("t") <= endT, col("value")))

  /** Graphite `scaleToSeconds(series, seconds)`: each point ×
    * seconds/step — re-expresses a per-interval count as a per-N-second
    * rate. The step is derived from the series' own grid (min Δt per
    * series — the hitcount discipline; constant on fetch grids), so
    * the function needs no out-of-band metadata. A one-point series
    * has no derivable step and nulls out.
    */
  def scaleToSeconds(f: DataFrame, seconds: Int): DataFrame = {
    require(seconds >= 1, s"scaleToSeconds: seconds must be >= 1 (got $seconds)")
    val wp = Window.partitionBy(col("path"))
    val withStep = f
      .withColumn("dt", col("t") - lag(col("t"), 1).over(byPath))
      .withColumn("step", min(col("dt")).over(wp))
    frame(withStep, wrap("scaleToSeconds", seconds.toString), col("t"),
      col("value") * (lit(seconds.toDouble) / col("step")))
  }

  /** Constant per-series stat line (Graphite `aggregateLine`): the
    * series' avg/min/max painted at EVERY grid point (the reference
    * line a dashboard draws behind the live series). K-row stat table
    * broadcast back onto the grid.
    */
  def aggregateLine(f: DataFrame, func: String): DataFrame = {
    // the one shared stat table (canonAgg + current/last) — graphite
    // 1.1 accepts any aggregate callback here, and single-sourcing
    // means this entry point can't cover less than the others
    val agg = seriesStat(func, "aggregateLine")
    val tab = f.groupBy(col("path")).agg(agg.as("lv"))
    frame(f.join(broadcast(tab), Seq("path"), "left"),
      concat(lit("aggregateLine("), col("path"), lit(s",'$func')")),
      col("t"), col("lv"))
  }

  /** Aggregate after REMOVING the given 0-based path nodes (Graphite
    * `sumSeriesWithWildcards` / `averageSeriesWithWildcards`, and the
    * 1.1 generic `aggregateWithWildcards(seriesList, func, *positions)`
    * front-end): series whose names differ only at the removed
    * positions merge under the reduced name — groupByNode generalized
    * to keep-all-but. The callback rides the one shared
    * canonAgg/aggExpr table (single-sourcing — the same coverage as
    * every grouped combiner). One groupBy(name′, t), map-side
    * combined.
    */
  def aggWithWildcards(f: DataFrame, func: String, positions: Seq[Int]): DataFrame = {
    require(positions.nonEmpty && positions.forall(_ >= 0),
      s"aggWithWildcards: positions must be non-negative (got $positions)")
    val parts = split(col("path"), "\\.")
    val reduced = array_join(
      filter(parts, (_, i) => !i.isin(positions.map(Int.box): _*)), ".")
    f.select(reduced.as("path"), col("t"), col("value"))
      .groupBy(col("path"), col("t"))
      .agg(aggExpr(canonAgg(func, "aggregateWithWildcards")).cast("double").as("value"))
  }

  /** The clamped discrete-rank pick over a sorted in-row list — the
    * [[seriesPercentile]] rule as a bare Column (shared by
    * [[percentileOfSeries]] and the band selectors).
    */
  private def pickPercentile(arr: Column, p: Double): Column =
    when(size(arr) > 0, element_at(arr,
      greatest(lit(1), least(size(arr),
        floor(lit(p / 100.0) * (size(arr) + 1)).cast("int")))))

  /** Graphite `removeBetweenPercentile(seriesList, n)` (n folded to
    * ≥ 50): keep series with at least one point OUTSIDE the open
    * per-timestamp ((100−n)th, nth) percentile band across series —
    * the "show me only the outliers" selector. One groupBy(t) builds
    * both band edges from a single sorted list; the survivor set is a
    * K-row broadcast semi-join like every selection function.
    */
  def removeBetweenPercentile(f: DataFrame, nIn: Double): DataFrame = {
    val p = if (nIn < 50) 100 - nIn else nIn
    val band = f.groupBy(col("t"))
      .agg(array_sort(collect_list(col("value"))).as("arr"))
      .select(col("t"), pickPercentile(col("arr"), 100 - p).as("lo"),
        pickPercentile(col("arr"), p).as("hi"))
    val keep = f.join(broadcast(band), Seq("t"))
      .filter(col("value") <= col("lo") || col("value") >= col("hi"))
      .select(col("path")).distinct()
    f.join(broadcast(keep), Seq("path"), "left_semi")
  }

  /** Graphite `averageOutsidePercentile(seriesList, n)` (n folded to
    * ≥ 50): keep series whose MEAN lies outside the open percentile
    * band of all series' means — a K-row problem end-to-end (per-series
    * avg table, band over the K means, semi-join back). Comparisons on
    * the round-6 grid (the filterByStat engine-stability discipline —
    * both sides are independently computed floats here).
    */
  def averageOutsidePercentile(f: DataFrame, nIn: Double): DataFrame = {
    val p = if (nIn < 50) 100 - nIn else nIn
    val avgs = f.groupBy(col("path")).agg(avg(col("value")).as("m"))
    val band = avgs.agg(array_sort(collect_list(col("m"))).as("arr"))
      .select(pickPercentile(col("arr"), 100 - p).as("lo"),
        pickPercentile(col("arr"), p).as("hi"))
    val keep = avgs.crossJoin(broadcast(band))
      .filter(round(col("m"), 6) <= round(col("lo"), 6) ||
        round(col("m"), 6) >= round(col("hi"), 6))
      .select(col("path"))
    f.join(broadcast(keep), Seq("path"), "left_semi")
  }

  /** Graphite `fallbackSeries(seriesList, fallback)`: the fallback
    * list stands in when the primary is EMPTY (a dead glob, a gone
    * host). The emptiness probe is a bounded limit-1 scan at eval time
    * — render evaluation is per-request, not a standing plan, and the
    * probe touches one partition of the already-filtered fetch.
    */
  def fallbackSeries(primary: DataFrame, fallback: DataFrame): DataFrame =
    if (primary.isEmpty) fallback else primary

  /** Graphite 1.1 `aggregate(seriesList, func)` — the generic
    * combiner front-end: one name, every across-series aggregate
    * (graphite deprecated the individual sumSeries-style functions in
    * its favor). Canonicalizes graphite's spelling variants and
    * dispatches to [[combine]]'s shared table, so the arithmetic has
    * exactly one source; unknown funcs fail loudly.
    */
  def aggregateSeries(f: DataFrame, func: String, name: String): DataFrame =
    combine(f, canonAgg(func, "aggregate"), name)

  /** Graphite 1.1 `aggregate(seriesList, func, xFilesFactor)` — the
    * 3-arg form: a per-timestamp point emits only when the NON-NULL
    * fraction across the input series clears xff (graphite's
    * `xff(nonNull, total) >= xFilesFactor` gate — the render-level
    * twin of B6's rollup xff). On the dense-grid frame contract,
    * count(*) per timestamp IS the series count. Same single
    * groupBy(t) as [[combine]], two extra count columns.
    */
  def aggregateSeriesXff(f: DataFrame, func: String, xff: Double,
                         name: String): DataFrame = {
    require(xff >= 0.0 && xff <= 1.0,
      s"aggregate: xFilesFactor must be in [0,1] (got $xff)")
    val agg = aggExpr(canonAgg(func, "aggregate"))
    f.groupBy(col("t"))
      .agg(agg.cast("double").as("v"),
        count(col("value")).as("nn"), count(lit(1)).as("n"))
      .select(lit(name).as("path"), col("t"),
        when(col("nn").cast("double") >= lit(xff) * col("n"), col("v"))
          .as("value"))
  }

  /** Graphite `groupByNodes(seriesList, func, *nodes)` — the
    * multi-dimension rollup ([[groupByNode]] generalized): series
    * collapse under the dot-joined SELECTED node values (per-host AND
    * per-metric at once, where groupByNode keeps only one dimension).
    * One map-side-combined groupBy(key, t); `concat_ws` drops null
    * (out-of-range) components — list semantics in both engines.
    */
  def groupByNodes(f: DataFrame, func: String, nodes: Seq[Int]): DataFrame = {
    require(nodes.nonEmpty, "groupByNodes: need at least one node index")
    val parts = split(col("path"), "\\.")
    val key = concat_ws(".",
      nodes.map(i => element_at(parts, if (i >= 0) i + 1 else i)): _*)
    f.select(key.as("path"), col("t"), col("value"))
      .groupBy(col("path"), col("t"))
      .agg(aggExpr(canonAgg(func, "groupByNodes")).cast("double").as("value"))
  }

  /** Graphite 1.1 `minMax(seriesList)` — per-series [0,1]
    * normalization against the series' own non-null min/max (the
    * compare-shapes-not-scales overlay): a flat series (max == min)
    * reads 0, nulls stay null. Two per-series windows, no shuffle
    * beyond the fetch frame's partitioning.
    */
  def minMax(f: DataFrame): DataFrame = {
    val wp = Window.partitionBy(col("path"))
    val mn = min(col("value")).over(wp)
    val mx = max(col("value")).over(wp)
    frame(f, wrap("minMax", ""), col("t"),
      when(col("value").isNotNull,
        when(mx === mn, 0.0).otherwise((col("value") - mn) / (mx - mn))))
  }

  /** Graphite `unique(seriesList)` — duplicate series collapse, the
    * cleanup after `group()` of overlapping globs (each shared series
    * would otherwise render — and aggregate — twice). Overlapping
    * globs duplicate IDENTICAL (path, t, value) rows in the frame
    * model, so set-distinct is exactly graphite's first-occurrence
    * rule.
    */
  def uniqueSeries(f: DataFrame): DataFrame = f.distinct()

  /** Graphite `secondYAxis(seriesList)` — the right-axis marker: a
    * pure name wrap the renderer interprets; values untouched,
    * map-only.
    */
  def secondYAxis(f: DataFrame): DataFrame =
    frame(f, wrap("secondYAxis", ""), col("t"), col("value"))

  /** Graphite `multiplySeriesWithWildcards(seriesList, *positions)` —
    * the product twin of [[aggWithWildcards]]: series whose names
    * differ only at the removed positions multiply under the reduced
    * name, with [[multiplySeries]]'s null law (any missing factor
    * nulls the product) and its sorted in-row fold so the product
    * order is deterministic.
    */
  def multiplyWithWildcards(f: DataFrame, positions: Seq[Int]): DataFrame = {
    require(positions.nonEmpty && positions.forall(_ >= 0),
      s"multiplySeriesWithWildcards: positions must be non-negative (got $positions)")
    val parts = split(col("path"), "\\.")
    val reduced = array_join(
      filter(parts, (_, i) => !i.isin(positions.map(Int.box): _*)), ".")
    f.select(reduced.as("path"), col("t"), col("value"))
      .groupBy(col("path"), col("t"))
      .agg(count(lit(1)).as("n"), count(col("value")).as("nn"),
        sort_array(collect_list(struct(col("value").as("value")))).as("vs"))
      .select(col("path"), col("t"),
        when(col("nn") === col("n") && col("n") > 0,
          aggregate(col("vs"), lit(1.0), (acc, x) => acc * x.getField("value")))
          .as("value"))
  }

  /** Graphite `keepLastValue(series, limit)` — the bounded-bridge
    * form: a consecutive-null run of at most `limit` points carries
    * the last seen value across its WHOLE length; a longer run stays
    * entirely broken (the unlimited overload bridges everything —
    * hiding a dead host behind its last reading is exactly what the
    * limit exists to prevent). Row-position arithmetic over per-series
    * windows: gap length = next non-null position − last non-null
    * position − 1.
    */
  def keepLastValue(f: DataFrame, limit: Int): DataFrame = {
    require(limit >= 1, s"keepLastValue: limit must be >= 1 (got $limit)")
    val wp = byPath.rowsBetween(Window.unboundedPreceding, 0)
    val wf = byPath.rowsBetween(0, Window.unboundedFollowing)
    val tagged = f.withColumn("rn", row_number().over(byPath))
    // Graphite bridges a consecutive-None run ONLY when the WHOLE run
    // is <= limit — a 3-null gap with limit 2 stays fully broken. Gap
    // length for a null row = (next non-null rn, or one-past-end for a
    // trailing gap) - last non-null rn - 1; graphite's final loop
    // fills a trailing run <= limit the same way. Leading gaps (no
    // carried value) stay null. Named without the limit arg, as
    // graphite does.
    frame(tagged
      .withColumn("li", max(when(col("value").isNotNull, col("rn"))).over(wp))
      .withColumn("ni", min(when(col("value").isNotNull, col("rn"))).over(wf))
      .withColumn("mx", max(col("rn")).over(Window.partitionBy(col("path"))))
      .withColumn("hv", last(col("value"), ignoreNulls = true).over(wp)),
      wrap("keepLastValue", ""), col("t"),
      when(col("value").isNotNull, col("value"))
        .when(col("li").isNotNull &&
          coalesce(col("ni"), col("mx") + 1) - col("li") - 1 <= limit,
          col("hv")))
  }

  // ---- C16: graphite 1.1 parity sweep ------------------------------------

  /** Graphite 1.1 `groupByTags(seriesList, func, *tags)` — the tagged
    * twin of [[groupByNodes]]: series collapse under the canonical
    * tagged path built from the REQUESTED tags (graphite's documented
    * example: grouping disk.used by 'datacenter' yields
    * `disk.used;datacenter=dc1`, `…;datacenter=dc2`), per-timestamp
    * aggregate from the one shared canonAgg/aggExpr table. The output
    * path always leads with the implicit `name` tag's value and
    * appends the requested non-name tags in canonical sorted-tag
    * order (the tagged-whisper write convention, so a group's path is
    * unique); a missing tag contributes `;tag=` with an empty value —
    * the missing-reads-as-'' law shared with the seriesByTag matchers.
    * One map-side-combined groupBy(key, t): the key is a string
    * extraction on the path column, so the plan is groupByNodes' plan
    * — never per-group work.
    */
  def groupByTags(f: DataFrame, func: String, tags: Seq[String]): DataFrame = {
    require(tags.nonEmpty, "groupByTags: need at least one tag")
    val rest = tags.filter(_ != "name").distinct.sorted
    val key = concat(Tags.tagValueCol("name") +:
      rest.map(tg => concat(lit(";" + tg + "="), Tags.tagValueCol(tg))): _*)
    f.select(key.as("path"), col("t"), col("value"))
      .groupBy(col("path"), col("t"))
      .agg(aggExpr(canonAgg(func, "groupByTags")).cast("double").as("value"))
  }

  /** Graphite 1.1 `filterSeries(seriesList, func, operator, threshold)`
    * — the generic stat gate [[filterByStat]]'s above/below pair
    * specializes: any callback from the shared [[seriesStat]] table,
    * any of the six comparison operators. Comparisons on the round-6
    * grid (the filterByStat engine-stability discipline). K-row stat
    * table + broadcast semi-join, the selection-function shape.
    */
  def filterSeries(f: DataFrame, func: String, operator: String,
                   threshold: Double): DataFrame = {
    val statAgg: Column = seriesStat(func, "filterSeries")
    val s = round(col("s"), 6)
    val cmp: Column = operator match {
      case "="  => s === threshold
      case "!=" => s =!= threshold
      case ">"  => s > threshold
      case ">=" => s >= threshold
      case "<"  => s < threshold
      case "<=" => s <= threshold
      case other => throw new IllegalArgumentException(
        s"filterSeries: unknown operator '$other' (=, !=, >, >=, <, <=)")
    }
    val keep = f.groupBy(col("path")).agg(statAgg.as("s"))
      .filter(cmp).select(col("path"))
    f.join(broadcast(keep), Seq("path"), "left_semi")
  }

  /** Graphite `round(seriesList[, precision])`: values rounded to
    * `precision` decimals. Deliberate divergence, documented: both
    * this engine and the DuckDB oracle round HALF-UP (`round()` in
    * Spark and DuckDB), where graphite-web inherits Python 3's
    * banker's rounding — a tie at the last digit (rare on real
    * metrics) rounds away from zero here, to-even there.
    */
  def roundSeries(f: DataFrame, precision: Int): DataFrame =
    frame(f, wrap("round", precision.toString), col("t"),
      round(col("value"), precision))

  /** Graphite 1.1 `add(seriesList, constant)` — [[offset]]'s 1.1-era
    * alias with its own wrapped name.
    */
  def addConstant(f: DataFrame, k: Double): DataFrame =
    frame(f, wrap("add", fmtNum(k)), col("t"), col("value") + k)

  /** Graphite 1.1 `exp(seriesList)`: e^v, map-only. */
  def expSeries(f: DataFrame): DataFrame =
    frame(f, wrap("exp", ""), col("t"), exp(col("value")))

  /** Graphite 1.1 `sigmoid(seriesList)`: 1/(1+e^-v), map-only. */
  def sigmoidSeries(f: DataFrame): DataFrame =
    frame(f, wrap("sigmoid", ""), col("t"),
      lit(1.0) / (lit(1.0) + exp(-col("value"))))

  /** Graphite 1.1 `logit(seriesList)`: ln(v/(1−v)); points outside
    * (0,1) null out — graphite catches the math error and emits None
    * (logit(0) and logit(1) are ±∞).
    */
  def logitSeries(f: DataFrame): DataFrame =
    frame(f, wrap("logit", ""), col("t"),
      when(col("value") > 0.0 && col("value") < 1.0,
        log(col("value") / (lit(1.0) - col("value")))))

  /** Graphite `cactiStyle(seriesList)` — the Cacti-legend name suffix:
    * each series renamed to `<path> Current:<c> Max:<mx> Min:<mn>`
    * with the three stats %.2f-formatted from the shared
    * [[seriesStat]] table ('current' = latest non-null). Stats are
    * round(,2)-ed BEFORE formatting — the rounding happens in the
    * engines' shared round() (the round-4 value discipline), and
    * %.2f of an already-2-decimal double is tie-free, where Java's
    * Formatter rounds HALF_UP and C-family printf half-even; an
    * all-null series formats as `nan` (graphite's float('nan')
    * rendering). Values untouched;
    * K-row stat table broadcast back — naming only. The system/units
    * variants (si scaling) are out of scope — callers wanting scaled
    * legends compose `scale` upstream.
    */
  def cactiStyle(f: DataFrame): DataFrame = {
    def fmt(c: Column): Column =
      when(c.isNotNull, format_string("%.2f", round(c, 2))).otherwise(lit("nan"))
    val tab = f.groupBy(col("path")).agg(
      seriesStat("current", "cactiStyle").as("cur"),
      max(col("value")).as("mx"), min(col("value")).as("mn"))
    frame(f.join(broadcast(tab), Seq("path"), "left"),
      concat(col("path"), lit(" Current:"), fmt(col("cur")),
        lit(" Max:"), fmt(col("mx")), lit(" Min:"), fmt(col("mn"))),
      col("t"), col("value"))
  }

  /** Graphite `legendValue(seriesList, *valueTypes)` — names gain one
    * " (type: value)" suffix per requested stat, the OTHER Grafana
    * legend idiom (cactiStyle's generic sibling): stats ride the
    * shared [[seriesStat]] table (avg/total/min/max/last/…, graphite's
    * spellings via canonAgg), formatted with the cactiStyle discipline
    * — round(,2) BEFORE %.2f so the format step is tie-free in both
    * engines (the documented divergence from graphite's raw
    * str(float)) — and an all-null stat reads "None", graphite's
    * text. The 'si'/'binary' unit systems are rejected loudly: unit
    * scaling is a renderer concern this frame model doesn't carry
    * (the secondYAxis doc).
    */
  def legendValue(f: DataFrame, valueTypes: Seq[String]): DataFrame = {
    require(valueTypes.nonEmpty, "legendValue: need at least one valueType")
    require(!valueTypes.exists(v => v == "si" || v == "binary"),
      "legendValue: unit systems (si/binary) are not supported — " +
        "unit scaling is a renderer concern")
    val aggs = valueTypes.zipWithIndex.map { case (vt, i) =>
      seriesStat(vt, "legendValue").as(s"v$i")
    }
    val tab = f.groupBy(col("path")).agg(aggs.head, aggs.tail: _*)
    def fmt(c: Column): Column =
      when(c.isNotNull, format_string("%.2f", round(c, 2))).otherwise(lit("None"))
    val name = valueTypes.zipWithIndex.foldLeft(col("path")) {
      case (acc, (vt, i)) =>
        concat(acc, lit(s" ($vt: "), fmt(col(s"v$i")), lit(")"))
    }
    frame(f.join(broadcast(tab), Seq("path"), "left"),
      name, col("t"), col("value"))
  }

  /** The DISPLAY-OPTION family (graphite's style channel): `color`,
    * `lineWidth`, `alpha` set renderer attributes WITHOUT renaming in
    * graphite-web, so here — where the frame deliberately carries no
    * style channel (the secondYAxis doc) — they are argument-validated
    * IDENTITY pass-throughs: the target PARSES and the data surface is
    * exactly graphite's (values and names untouched). `dashed`,
    * `stacked`, `drawAsInfinite` DO rename in graphite-web, and the
    * wrapped name is the one place style survives this model, so they
    * rename here identically (dashed's default length 5, graphite's
    * `%g` ≈ fmtNum). All map-only.
    */
  def colorSeries(f: DataFrame, theColor: String): DataFrame = {
    require(theColor.nonEmpty, "color: color must be non-empty")
    f
  }

  def lineWidth(f: DataFrame, width: Double): DataFrame = {
    require(width > 0, s"lineWidth: width must be positive (got $width)")
    f
  }

  def alphaSeries(f: DataFrame, a: Double): DataFrame = {
    require(a >= 0.0 && a <= 1.0, s"alpha: alpha must be in [0,1] (got $a)")
    f
  }

  def dashed(f: DataFrame, dashLength: Double = 5.0): DataFrame = {
    require(dashLength > 0, s"dashed: dashLength must be positive (got $dashLength)")
    frame(f, concat(lit("dashed("), col("path"),
      lit(s", ${fmtNum(dashLength)})")), col("t"), col("value"))
  }

  def stacked(f: DataFrame): DataFrame =
    frame(f, wrap("stacked", ""), col("t"), col("value"))

  def drawAsInfinite(f: DataFrame): DataFrame =
    frame(f, wrap("drawAsInfinite", ""), col("t"), col("value"))

  /** Positional pairing for the `*SeriesLists` family: the i-th series
    * of each K-row list (BY SORTED NAME — graphite pairs by store
    * order, which is not an order at all; name order is this engine's
    * deterministic replacement, the limitSeries precedent) joined on
    * (pair rank, t). List lengths must match — graphite raises too;
    * the length check is two K-row metadata counts (graphite
    * materializes both lists the same way). Returns
    * (pa, pb, t, va, vb) with a FULL outer join on the grid so each
    * func's null law applies symmetrically.
    */
  private def pairSeriesLists(a: DataFrame, b: DataFrame, ctx: String): DataFrame = {
    import graft.core.Caching._
    val wOrd = Window.orderBy(col("path"))
    // K-row rank tables, cached: the eager length check below
    // materializes them once and the pairing joins reuse the same
    // K rows instead of re-scanning each frame a second time
    val ra = a.select(col("path")).distinct()
      .select(col("path").as("pa"), row_number().over(wOrd).as("rk"))
      .cachedOnce
    val rb = b.select(col("path")).distinct()
      .select(col("path").as("pb"), row_number().over(wOrd).as("rk"))
      .cachedOnce
    val (na, nb) = (ra.count(), rb.count())
    require(na == nb,
      s"$ctx: series lists must be the same length (got $na vs $nb)")
    val pairs = ra.join(rb, Seq("rk"))
    val av = a.join(broadcast(pairs.select(col("pa"), col("rk"))), col("path") === col("pa"))
      .select(col("rk"), col("t"), col("value").as("va"))
    val bv = b.join(broadcast(pairs.select(col("pb"), col("rk"))), col("path") === col("pb"))
      .select(col("rk"), col("t"), col("value").as("vb"))
    av.join(bv, Seq("rk", "t"), "full_outer")
      .join(broadcast(pairs), Seq("rk"))
  }

  /** Graphite 1.1 `aggregateSeriesLists(listA, listB, func)` plus its
    * named aliases (`sumSeriesLists`, `diffSeriesLists`,
    * `multiplySeriesLists`): the i-th series of each list combine
    * pointwise under graphite's safe* null laws — sum/diff treat a
    * missing side as 0 unless BOTH are missing (then null); multiply
    * nulls when EITHER side is (safeMul). Output named
    * `<func>Series(<a>,<b>)`, graphite's formatting.
    */
  def aggregateSeriesLists(a: DataFrame, b: DataFrame, func: String,
                           xff: Option[Double] = None): DataFrame = {
    val canon = func match {
      case "sum" | "total" => "sum"
      case "diff" => "diff"
      case "multiply" => "multiply"
      case other => throw new IllegalArgumentException(
        s"aggregateSeriesLists: unknown func '$other' (sum, diff, multiply)")
    }
    xff.foreach(x => require(x >= 0.0 && x <= 1.0,
      s"aggregateSeriesLists: xFilesFactor must be in [0,1] (got $x)"))
    val bothNull = col("va").isNull && col("vb").isNull
    val base: Column = canon match {
      case "sum" => when(!bothNull,
        coalesce(col("va"), lit(0.0)) + coalesce(col("vb"), lit(0.0)))
      case "diff" => when(!bothNull,
        coalesce(col("va"), lit(0.0)) - coalesce(col("vb"), lit(0.0)))
      case "multiply" => col("va") * col("vb")
    }
    // graphite 1.1's optional 4th argument gates each paired point on
    // the non-null fraction (the aggregateSeriesXff rule at n = 2):
    // the point emits only when nn >= xff·2 — a 0.99 gate demands both
    // sides present (ADVICE r9: the argument changes output data, so
    // silently ignoring it violated the fail-loudly rule)
    val nn = col("va").isNotNull.cast("int") + col("vb").isNotNull.cast("int")
    val v = xff match {
      case Some(x) => when(nn.cast("double") >= lit(x) * lit(2.0), base)
      case None => base
    }
    pairSeriesLists(a, b, "aggregateSeriesLists")
      .select(concat(lit(s"${canon}Series("), col("pa"), lit(","),
        col("pb"), lit(")")).as("path"), col("t"), v.as("value"))
  }

  /** Graphite `divideSeriesLists(dividends, divisors)` — the
    * positional-pairing twin of [[divideSeries]]: i-th dividend over
    * i-th divisor, zero/absent divisor → null (the shared
    * divide-by-zero rule), named `divideSeries(<a>,<b>)`.
    */
  def divideSeriesLists(a: DataFrame, b: DataFrame): DataFrame =
    pairSeriesLists(a, b, "divideSeriesLists")
      .select(concat(lit("divideSeries("), col("pa"), lit(","),
        col("pb"), lit(")")).as("path"), col("t"),
        when(col("vb") =!= 0, col("va") / col("vb")).as("value"))

  // ---- window generators: series synthesized from the render window ----

  /** Graphite `constantLine(value)`: three points — window start,
    * midpoint, end (graphite's own 3-point construction, step =
    * (until−from)/2 integer division) — named by the value's
    * canonical text. Driver-side 3-row literal, the K-row metadata
    * convention.
    */
  def constantLine(spark: org.apache.spark.sql.SparkSession, value: Double,
                   fromT: Long, untilT: Long): DataFrame = {
    require(untilT > fromT, s"constantLine: empty window [$fromT, $untilT)")
    import spark.implicits._
    val step = (untilT - fromT) / 2
    Seq(fromT, fromT + step, fromT + 2 * step)
      .map(t => (fmtNum(value), t, value)).toDF("path", "t", "value")
  }

  /** Graphite `time(name[, step])` (alias `timeFunction`) / and the
    * basis for `identity(name)`: one series whose value at each grid
    * point IS the timestamp, from window start exclusive of the end
    * (graphite's while-loop bound), default step 60 s. Generated with
    * `spark.range` — distributed, though the row count is
    * window/step.
    */
  def timeFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                   step: Long, fromT: Long, untilT: Long): DataFrame = {
    require(step > 0, s"time: step must be positive (got $step)")
    spark.range(fromT, untilT, step)
      .select(lit(name).as("path"), col("id").as("t"),
        col("id").cast("double").as("value"))
  }

  /** Graphite `verticalLine(ts[, label[, color]])`: a time MARKER —
    * two 1.0 points at [ts, ts+1] (graphite's TimeSeries(start=ts,
    * end=ts, step=1, [1.0, 1.0])), named by the label. The timestamp
    * must lie INSIDE the render window — graphite raises "timestamp
    * exists before start of range" / "after end" — so a dashboard
    * whose marker scrolled out of view fails loudly instead of
    * silently drawing nothing.
    */
  def verticalLine(spark: org.apache.spark.sql.SparkSession, ts: Long,
                   label: String, fromT: Long, untilT: Long): DataFrame = {
    require(ts >= fromT,
      s"verticalLine(): timestamp $ts exists before start of range ($fromT)")
    require(ts <= untilT,
      s"verticalLine(): timestamp $ts exists after end of range ($untilT)")
    import spark.implicits._
    Seq((label, ts, 1.0), (label, ts + 1, 1.0)).toDF("path", "t", "value")
  }

  private[tsdb] def fmtNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else String.format(java.util.Locale.ROOT, "%s", Double.box(v))
}
