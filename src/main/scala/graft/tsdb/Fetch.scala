package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whisper fetch(from, until): clamp the request window, select the
  * highest-precision archive that still covers `from`, quantize the
  * bounds to its grid, and return a **dense** series — one row per grid
  * interval per path, value null where no point exists
  * (/root/reference/L_DataWhisper.lua:356-411,525-552).
  *
  * The dense grid is sequence+explode over the matched paths (no driver
  * loop); the archive join is an equi-join on (path, bucket). At scale
  * the path filter is pushed into the scan before any shuffle.
  */
object Fetch {

  final case class Clamped(from: Long, until: Long, archive: Retention.Archive)

  /** Window clamping + archive selection (L_DataWhisper.lua:525-549).
    * Returns None when the range is entirely in the future or beyond
    * retention.
    */
  def select(spec: Seq[Retention.Archive], fromTime: Long, untilTime0: Long,
             now: Long): Option[Clamped] = {
    require(fromTime <= untilTime0, s"Invalid time interval: from $fromTime after until $untilTime0")
    def oldest(a: Retention.Archive): Long =
      (now - now % a.secondsPerPoint) - a.retention + a.secondsPerPoint
    val oldestTime = oldest(spec.last)
    if (fromTime > now || untilTime0 < oldestTime) None
    else {
      val from = math.max(fromTime, oldestTime)
      val until = math.min(untilTime0, now)
      val archive = spec.find(a => oldest(a) <= from).getOrElse(spec.last)
      Some(Clamped(from, until, archive))
    }
  }

  /** Dense fetch over a pre-built archive DataFrame (path, bucket, value).
    * The grid derives from the archive itself, so the join side is
    * re-aliased to keep attribute ids distinct (self-join safety).
    */
  def fetchDense(spark: SparkSession, archive: DataFrame, step: Long,
                 from: Long, until: Long): DataFrame =
    fetchDensePaths(archive.select(col("path")).distinct(), archive, step, from, until)

  /** Dense fetch where the grid's path set comes from an explicit paths
    * DataFrame (one `path` column) — a metric *index*, independent of
    * which paths happen to have data inside the window. A Whisper file
    * exists (and fetch returns all-null) even when the range is empty
    * (L_DataWhisper.lua:525-552); deriving the grid from a time-pruned
    * scan would silently drop idle metrics.
    */
  def fetchDensePaths(pathsDf: DataFrame, archive: DataFrame, step: Long,
                      from: Long, until: Long): DataFrame = {
    val fromQ = from - from % step
    val untilQ = until - until % step
    val grid = pathsDf.select(col("path")).distinct()
      .select(col("path"), explode(sequence(lit(fromQ), lit(untilQ), lit(step))).as("t"))
    val arch = archive.select(col("path").as("a_path"), col("bucket"), col("value"))
    grid.join(arch, col("path") === col("a_path") && col("t") === col("bucket"), "left")
      .select(col("path"), col("t"), col("value"))
  }

  /** Missing-value policy implied by the aggregation method
    * (L_DataGraph.lua:172-173): `average` leaves gaps null, `sum` reads
    * a gap as zero, `last`/`max`/`min` hold the previous value. A
    * RENDER-time presentation rule in the reference — L_DataGraph's svg
    * path applies it (L_DataGraph.lua:221-230) while csv/json renders
    * emit the raw fetch nulls (graphite_cgi.lua:316-370) — so `fetch`
    * returns raw nulls and only `Render.svg` fills.
    */
  def gapPolicy(method: String): String = method match {
    case "sum"                  => "zero"
    case "last" | "max" | "min" => "hold"
    case _                      => "null"
  }

  /** Drawing mode implied by the aggregation method (L_DataGraph.lua:172):
    * `average` connects points, everything else is a staircase.
    */
  def drawMode(method: String): String =
    if (method == "average") "connected" else "staircase"

  /** Apply a gap policy to a dense (path, t, value) series. `hold` is a
    * per-path carry-forward window — the partition is one metric's rows
    * inside one fetch window (grid-sized, thousands of rows at most), so
    * the sort never concentrates the dataset on one task.
    */
  def fillGaps(dense: DataFrame, policy: String): DataFrame = policy match {
    case "zero" => dense.withColumn("value", coalesce(col("value"), lit(0.0)))
    case "hold" =>
      val w = Window.partitionBy(col("path")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.withColumn("value", last(col("value"), ignoreNulls = true).over(w))
    case _ => dense
  }

  /** End-to-end fetch for a glob target over raw metrics: filter paths
    * (scan-pushed rlike), build the archive cascade, select the archive
    * for the window, return the dense series with RAW nulls at gaps —
    * exactly what the reference's whisper fetch returns
    * (L_DataWhisper.lua:525-552); gap fill is svg-render presentation
    * (see gapPolicy).
    */
  /** The (path, t, value) schema every fetch returns — also for the
    * out-of-range empty result, so callers (render, unionByName over
    * targets, fetchRouted's projection) never see a schemaless frame.
    */
  val FetchSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("path", StringType), StructField("t", LongType),
      StructField("value", DoubleType)))
  }

  /** Empty series WITH the fetch schema (a stale-but-valid window must
    * return no rows, not crash the plan).
    */
  def emptyFetch(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), FetchSchema)

  def fetch(spark: SparkSession, metrics: DataFrame, target: String,
            spec: Seq[Retention.Archive], method: String, xff: Double,
            fromTime: Long, untilTime: Long, now: Long): DataFrame = {
    val regex = Glob.queryToRegex(target, allowDeeper = false)
    val matched = metrics.filter(col("path").rlike(regex))
    select(spec, fromTime, untilTime, now) match {
      case None => emptyFetch(spark)
      case Some(Clamped(from, until, archive)) =>
        val idx = spec.indexOf(archive)
        val arch = Rollup.archives(matched, spec.take(idx + 1), method, xff).last
        // grid paths come from the MATCHED raw scan, not the archive:
        // a path whose every bucket failed xFilesFactor at this level
        // must still return all-null rows (the whisper file exists,
        // L_DataWhisper.lua:525-552). This also leaves the archive plan
        // referenced once — no cache to pin.
        fetchDensePaths(matched.select(col("path")).distinct(), arch,
          archive.secondsPerPoint, from, until)
    }
  }
}
