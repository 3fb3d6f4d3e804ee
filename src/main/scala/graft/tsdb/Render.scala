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

  /** JSON string literal from a column: quote + escape backslash and
    * double-quote (metric names carry no control characters).
    */
  private def jstr(c: org.apache.spark.sql.Column) =
    concat(lit("\""),
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))

  /** Serialized treejson node objects (graphite_cgi.lua:226-234): one
    * JSON document per node, with the constant empty `context` object
    * the reference always emits.
    */
  def treejson(nodes: DataFrame): DataFrame =
    nodes.select(concat(
      lit("""{"allowChildren":"""), col("allow_children"),
      lit(""","context":{},"expandable":"""), col("expandable"),
      lit(""","id":"""), jstr(col("id")),
      lit(""","leaf":"""), col("leaf"),
      lit(""","text":"""), jstr(col("text")),
      lit("}")).as("node"))
      .orderBy(col("node"))

  /** Serialized completer response: ONE `{"metrics":[...]}` document
    * (graphite_cgi.lua:261). The aggregation is a single collect_list of
    * already-shaped row objects — completer results are node lists at
    * one tree level, metadata-sized by construction.
    */
  def completer(nodes: DataFrame): DataFrame =
    nodes
      .select(to_json(struct(col("is_leaf"), col("name"), col("path"))).as("j"))
      .agg(concat(lit("""{"metrics":["""),
        concat_ws(",", array_sort(collect_list(col("j")))), lit("]}")).as("doc"))

  /** jsonp wrapping (graphite_cgi.lua:105-109): `callback(body)` around
    * any single-column document DataFrame.
    */
  def jsonp(doc: DataFrame, callback: String): DataFrame = {
    val c = doc.columns.head
    doc.select(concat(lit(callback + "("), col(c), lit(")")).as(c))
  }
}
