package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graphite metrics API over the flat path namespace: find / expand /
  * index (/root/reference/graphite_cgi.lua:244-301, tree walk in
  * /root/reference/L_DataFinders.lua:152-217).
  *
  * The reference walks an in-memory directory tree per level; here the
  * "tree" is the distinct-path set and a query compiles to one anchored
  * regex pushed into the scan, then a prefix-aggregation classifies
  * nodes at the query depth as leaves (path ends there) or branches
  * (deeper paths exist).
  */
object MetricTree {

  /** Nodes matching the glob at its depth: (path, name, is_leaf). A
    * prefix can yield both a leaf and a branch row, like the reference
    * Store which yields both node objects.
    */
  def find(paths: DataFrame, query: String): DataFrame = {
    val d = Glob.depth(query)
    val regex = Glob.queryToRegex(query, allowDeeper = true)
    val matched = paths.filter(col("path").rlike(regex))
      .select(col("path"), size(split(col("path"), "\\.")).as("nc"))
      .select(concat_ws(".", slice(split(col("path"), "\\."), 1, d)).as("node"),
        (col("nc") === d).cast("long").as("leaf"))
    matched
      .groupBy(col("node"))
      .agg(max(col("leaf")).as("has_leaf"), max(lit(1L) - col("leaf")).as("has_branch"))
      .select(col("node"), explode(array(
        when(col("has_leaf") === 1L, lit(1L)),
        when(col("has_branch") === 1L, lit(0L)))).as("is_leaf"))
      .filter(col("is_leaf").isNotNull)
      .select(
        col("node").as("path"),
        element_at(split(col("node"), "\\."), -1).as("name"),
        col("is_leaf"))
  }

  /** /metrics/expand: matching node paths at query depth; branches get a
    * trailing dot (graphite_cgi.lua:275-281).
    */
  def expand(paths: DataFrame, query: String, leavesOnly: Boolean): DataFrame = {
    val nodes = find(paths, query)
    val filtered = if (leavesOnly) nodes.filter(col("is_leaf") === 1L) else nodes
    filtered
      .select(when(col("is_leaf") === 1L, col("path"))
        .otherwise(concat(col("path"), lit("."))).as("path"))
      .distinct()
  }

  /** /metrics/index.json: every leaf path, sorted (graphite_cgi.lua:285-301). */
  def index(paths: DataFrame): DataFrame =
    paths.select(col("path")).distinct().orderBy(col("path"))
}
