package graft.tsdb

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Finder federation semantics (Store, L_DataGraphiteAPI.lua:340-397):
  * first-leaf-wins across finders, branch dedup, dataMine channel
  * naming, per-leaf intervals.
  */
class FindersSpec extends SparkSpec {
  import spark.implicits._

  test("dataMine channel names: <vera>.<%03d dev>.<service>.<variable>") {
    val pts = Seq(
      (7L, "urn:x:EnergyMetering1", "KWH", 100L),
      (7L, "urn:x:EnergyMetering1", "KWH", 300L),
      (42L, "urn:x:SwitchPower1", "Status", 200L)
    ).toDF("device", "service", "variable", "ts")
    val out = Finders.datamineLeaves(pts).orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("DM.007.urn:x:EnergyMetering1.KWH", 100L, 300L),
      ("DM.042.urn:x:SwitchPower1.Status", 200L, 200L)))
  }

  test("device ids wider than 3 digits pad-only, never truncate (%03d semantics)") {
    val pts = Seq(
      (1234L, "urn:x:S1", "V1", 10L),
      (1235L, "urn:x:S1", "V1", 20L)
    ).toDF("device", "service", "variable", "ts")
    val paths = Finders.datamineLeaves(pts).collect().map(_.getString(0)).sorted
    // lpad would collide both onto 'DM.123....'
    assert(paths.toSeq == Seq("DM.1234.urn:x:S1.V1", "DM.1235.urn:x:S1.V1"))
  }

  test("a glob spanning both namespaces fetches from BOTH readers") {
    val metrics = Seq(("vera.u1.click", 30L, 1.0)).toDF("path", "ts", "value")
    val dmPoints = Seq((7L, "urn:x:S1", "V1", 13L, 1.5))
      .toDF("device", "service", "variable", "ts", "value")
    val spec = Retention.parse("1m:1h")
    val out = Finders.fetchRouted(spark, metrics, dmPoints, "*.*.*.*",
      spec, "average", 0.0, 0L, 60L, 200L).collect()
      .map(_.getString(0)).distinct.sorted
    // the DM leaf appears in /metrics/find for this glob, so /render
    // must serve it too — not silently route whisper-only
    assert(out.contains("DM.007.urn:x:S1.V1"))
  }

  test("first finder claiming a leaf path provides its intervals") {
    val f0 = Seq(("a.x", 10L, 90L)).toDF("path", "earliest", "latest")
    val f1 = Seq(("a.x", 50L, 60L), ("a.y", 5L, 7L)).toDF("path", "earliest", "latest")
    val out = Finders.federate(Seq(f0, f1)).orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a.x: duplicate leaf — finder 0 wins (L_DataGraphiteAPI.lua:382-384)
    // a.y: only finder 1 has it — its intervals survive
    assert(out.toSeq == Seq(("a.x", 10L, 90L, 0L), ("a.y", 5L, 7L, 1L)))
  }

  test("routed fetch: whisper globs quantize, dataMine globs return raw samples") {
    val metrics = Seq(("vera.u1.click", 30L, 1.0), ("vera.u1.click", 90L, 3.0))
      .toDF("path", "ts", "value")
    val dmPoints = Seq((7L, "urn:x:S1", "V1", 13L, 1.5), (7L, "urn:x:S1", "V1", 59L, 2.5))
      .toDF("device", "service", "variable", "ts", "value")
    val spec = Retention.parse("1m:1h")
    // dataMine namespace → raw samples at their own (non-uniform) times
    val dm = Finders.fetchRouted(spark, metrics, dmPoints, "DM.*.*.*",
      spec, "average", 0.0, 0L, 120L, 200L).orderBy("t").collect()
    assert(dm.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("DM.007.urn:x:S1.V1", 13L, 1.5), ("DM.007.urn:x:S1.V1", 59L, 2.5)))
    // whisper namespace → dense quantized grid (1m buckets, null gaps)
    val wh = Finders.fetchRouted(spark, metrics, dmPoints, "vera.*.*",
      spec, "average", 0.0, 0L, 120L, 200L).orderBy("t").collect()
    assert(wh.map(_.getLong(1)).toSeq == Seq(0L, 60L, 120L))
    assert(wh.map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq ==
      Seq(1.0, 3.0, null))
  }

  test("federated find: leaves carry intervals, branches carry nulls") {
    val whisper = Seq(("vera.u1.click", 10L, 90L)).toDF("path", "earliest", "latest")
    val dm = Finders.datamineLeaves(
      Seq((1L, "urn:x:S1", "V1", 20L)).toDF("device", "service", "variable", "ts"))
    val top = Finders.find(Seq(whisper, dm), "*").orderBy("path").collect()
    assert(top.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("DM", 0L), ("vera", 0L)))
    assert(top.forall(r => r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)))
    val leaves = Finders.find(Seq(whisper, dm), "DM.*.*.*").collect()
    assert(leaves.map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq ==
      Seq(("DM.001.urn:x:S1.V1", 1L, 1L, 20L, 20L)))
  }
}
