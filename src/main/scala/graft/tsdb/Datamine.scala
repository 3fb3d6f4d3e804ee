package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** dataMine bridge: uniform-grid resampling with last-sample-≤-t
  * semantics, per-channel filters, and weekly partitioning
  * (/root/reference/L_DataMineServer.lua:138-183,
  * /root/reference/L_DataBaseDM.lua:156-232).
  */
object Datamine {

  /** The reference's grid: n points, dt=(t2-t1)/(n-1), rounded to the
    * nearest second (L_DataMineServer.lua:138-146).
    */
  def gridTimes(t1: Long, t2: Long, n: Int): Seq[Long] = {
    val dt = (t2 - t1).toDouble / (n - 1)
    (0 until n).map(i => math.floor(t1 + i * dt + 0.5).toLong)
  }

  /** Resample one channel to the grid: value at grid time t = latest
    * sample with ts <= t (L_DataMineServer.lua:148-164), null before the
    * first sample. Implemented as the union + running-last-value window
    * (a single sort per channel — scales by partitioning on path), not a
    * per-point lookup.
    *
    * Points are first deduplicated per second via deterministic max
    * (the reference's cursor sees one value per timestamp).
    */
  def resample(points: DataFrame, grid: Seq[Long]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points
      .groupBy(col("ts")).agg(max(col("value")).as("value"))
      .select(col("ts").as("t"), col("value"), lit(0).as("is_grid"))
    val gridDf = grid.toDF("t").select(col("t"),
      lit(null).cast("double").as("value"), lit(1).as("is_grid"))
    val w = Window.orderBy(col("t"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.unionByName(gridDf)
      .withColumn("v", last(col("value"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("t"), col("v").as("value"))
  }

  /** All-channels resample: same last-sample-≤-t semantics, windowed
    * PER PATH — the scale path (one sort per path partition, shuffle
    * keyed by path; the single-channel `resample` keeps the reference's
    * one-channel cursor shape).
    */
  def resampleAll(points: DataFrame, grid: Seq[Long]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points
      .groupBy(col("path"), col("ts")).agg(max(col("value")).as("value"))
      .select(col("path"), col("ts").as("t"), col("value"), lit(0).as("is_grid"))
    val gridDf = points.select(col("path")).distinct()
      .crossJoin(grid.toDF("t"))
      .select(col("path"), col("t"), lit(null).cast("double").as("value"),
        lit(1).as("is_grid"))
    val w = Window.partitionBy(col("path")).orderBy(col("t"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.unionByName(gridDf)
      .withColumn("v", last(col("value"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("path"), col("t"), col("v").as("value"))
  }

  /** dataMine per-channel filter: offset then clamp to [lower, upper]
    * (L_DataMineServer.lua:166-183); nulls pass through.
    */
  def filter(df: DataFrame, offset: Double, lower: Double, upper: Double): DataFrame =
    df.withColumn("value",
      least(greatest(col("value") + lit(offset), lit(lower)), lit(upper)))

  /** dataMine weekly file bucketing (L_DataBaseDM.lua:156-159):
    * week = floor(ts / 1 week); per (path, week) stats.
    */
  def weekly(metrics: DataFrame): DataFrame =
    metrics
      .groupBy(col("path"), floor(col("ts") / 604800L).cast("long").as("week"))
      .agg(count(lit(1)).as("n"),
        // -1e-9: settle exact .xxxx5 rounding boundaries downward so the
        // rounded value is summation-order independent (Queries.Eps doc)
        round(avg(col("value")) - lit(1e-9), 4).as("avg_value"))
      .orderBy(col("path"), col("week"))
}
