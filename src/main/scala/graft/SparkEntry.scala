package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry maps to.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E. relational core
    "q1_agg" -> ((s, dir) => Relational.q1Agg(s, dir)),
    "q3_join" -> ((s, dir) => Relational.q3Join(s, dir)),
    "q5_multijoin" -> ((s, dir) => Relational.q5MultiJoin(s, dir)),
    "topk_window" -> ((s, dir) => Relational.topkWindow(s, dir)),
    "event_sessionize" -> ((s, dir) => Relational.eventSessionize(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,
    "q5_multijoin" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "topk_window" ->
      """SELECT o_custkey, rk, o_orderkey, totalprice FROM (
        | SELECT o_custkey, o_orderkey, round(o_totalprice,4) AS totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) t
        |WHERE rk <= 2
        |ORDER BY o_custkey, rk""".stripMargin,
    "event_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
        | FROM events),
        |g AS (
        | SELECT user_id,
        |  t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
        | FROM e)
        |SELECT user_id,
        | sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS n_sessions,
        | count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
