package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graphite render output formats over a fetched dense series
  * (/root/reference/graphite_cgi.lua:318-371).
  */
object Render {

  /** csv format: `target,YYYY-MM-DD HH:MM:SS,value` rows
    * (graphite_cgi.lua:318-337). Timestamps rendered in UTC (session tz
    * is pinned to UTC).
    */
  def csv(fetched: DataFrame): DataFrame =
    fetched.select(
      col("path").as("target"),
      date_format(timestamp_seconds(col("t")), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
      round(col("value"), 4).as("value"))
      .orderBy(col("target"), col("ts_str"))

  /** json format: one row per target with the ordered `[value, ts]`
    * datapoint array (graphite_cgi.lua:340-371); nulls stay null.
    */
  def json(fetched: DataFrame): DataFrame =
    fetched
      .groupBy(col("path").as("target"))
      .agg(to_json(array_sort(collect_list(struct(
        col("t").as("t"),
        round(col("value"), 4).as("v"))))).as("datapoints"))
      .orderBy(col("target"))
}
