package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Finder federation — the reference's Store unions several finders
  * (Whisper files AND dataMine channel trees) into one /metrics/find
  * namespace (/root/reference/L_DataGraphiteAPI.lua:340-397,
  * /root/reference/L_DataFinders.lua:219-247): branch nodes dedup
  * across finders, and when several finders claim the same LEAF path
  * only the first finder's node survives
  * (L_DataGraphiteAPI.lua:382-384 "only return the FIRST leaf node").
  * Leaves carry the reader's (earliest, latest) interval metadata —
  * whisper derives it from the archive extremes
  * (L_DataFinders.lua:86-101), dataMine from the channel cursor's
  * first/last entries (L_DataFinders.lua:240-250).
  *
  * Spark shape: each finder is a leaf-namespace DataFrame
  * (path, earliest, latest); federation is a union + one groupBy(path)
  * with min_by on the finder index — no driver-side tree walk, and the
  * node classification reuses MetricTree.find's single-scan prefix
  * aggregation.
  */
object Finders {

  /** Whisper finder namespace: every metric path with its
    * earliest/latest datapoint (L_DataFinders.lua:86-96: min of the
    * oldest archive, max of the youngest).
    */
  def whisperLeaves(metrics: DataFrame): DataFrame =
    metrics.groupBy(col("path"))
      .agg(min(col("ts")).as("earliest"), max(col("ts")).as("latest"))

  /** dataMine finder namespace: channel names are
    * `<vera>.<zero-padded device>.<service>.<variable>`
    * (L_DataFinders.lua:352-356: `(self.vera or "DM") .. ".%03d"`,
    * display naming L_DataMineServer.lua:185-193), with intervals from
    * the channel's first/last samples. Input: one row per sample with
    * (device, service, variable, ts).
    */
  def datamineLeaves(points: DataFrame, veraPrefix: String = "DM"): DataFrame =
    points.groupBy(col("device"), col("service"), col("variable"))
      .agg(min(col("ts")).as("earliest"), max(col("ts")).as("latest"))
      .select(
        concat_ws(".", lit(veraPrefix),
          lpad(col("device").cast("string"), 3, "0"),
          col("service"), col("variable")).as("path"),
        col("earliest"), col("latest"))

  /** Union the finder namespaces with first-finder-wins leaf intervals:
    * one row per distinct leaf path, carrying (earliest, latest,
    * finder) from the lowest finder index that claims it.
    */
  def federate(finders: Seq[DataFrame]): DataFrame =
    finders.zipWithIndex.map { case (f, i) =>
      f.select(col("path"), col("earliest"), col("latest"),
        lit(i.toLong).as("finder"))
    }.reduce(_ unionByName _)
      .groupBy(col("path"))
      .agg(
        min_by(col("earliest"), col("finder")).as("earliest"),
        min_by(col("latest"), col("finder")).as("latest"),
        min(col("finder")).as("finder"))

  /** Federated /metrics/find: nodes over the union namespace; leaf
    * rows join their owning finder's intervals, branch rows carry
    * nulls (the reference's branch nodes have no reader,
    * L_DataGraphiteAPI.lua:155-163).
    */
  def find(finders: Seq[DataFrame], query: String): DataFrame =
    findIn(federate(finders), query)

  /** find over an already-federated leaf table — callers serving many
    * queries federate (and typically cache) once, then find per query;
    * re-federating per query would rebuild every finder's namespace
    * each time.
    */
  def findIn(leaves: DataFrame, query: String): DataFrame =
    MetricTree.find(leaves.select(col("path")), query).as("n")
      .join(leaves.as("l"),
        col("n.path") === col("l.path") && col("n.is_leaf") === 1L, "left")
      .select(col("n.path").as("path"), col("name"), col("is_leaf"),
        col("finder"), col("earliest"), col("latest"))

  /** The dataMine reader's fetch: the RAW samples inside [from, until],
    * NON-uniform — "a significant departure ... the time info step size
    * is nil" (L_DataFinders.lua:252-292): dataMine stores every change,
    * so the reader returns them as-is and the caller (the dataMine
    * server) resamples if it needs a grid (Datamine.resample).
    * Input: channel samples keyed by the federated channel path.
    */
  def datamineFetch(points: DataFrame, target: String,
                    from: Long, until: Long, veraPrefix: String = "DM"): DataFrame = {
    val path = concat_ws(".", lit(veraPrefix),
      lpad(col("device").cast("string"), 3, "0"),
      col("service"), col("variable"))
    points.select(path.as("path"), col("ts").as("t"), col("value"))
      .filter(col("path").rlike(Glob.queryToRegex(target, allowDeeper = false)))
      .filter(col("t").between(from, until))
  }

  /** Store-style fetch through the federated namespace: a target is
    * routed to the finder whose reader owns it — whisper globs get the
    * dense quantized archive fetch, dataMine globs the raw non-uniform
    * samples (the reference's LeafNode.fetch delegates to its reader,
    * L_DataGraphiteAPI.lua:188-191). Routing is by namespace prefix:
    * dataMine channel paths live under `<veraPrefix>.`
    * (L_DataFinders.lua:352-356), everything else is whisper.
    */
  def fetchRouted(spark: org.apache.spark.sql.SparkSession,
                  metrics: DataFrame, dmPoints: DataFrame, target: String,
                  spec: Seq[Retention.Archive], method: String, xff: Double,
                  from: Long, until: Long, now: Long,
                  veraPrefix: String = "DM"): DataFrame =
    if (target == veraPrefix || target.startsWith(veraPrefix + "."))
      datamineFetch(dmPoints, target, from, until, veraPrefix)
    else
      Fetch.fetch(spark, metrics, target, spec, method, xff, from, until, now)
        .select(col("path"), col("t"), col("value"))
}
