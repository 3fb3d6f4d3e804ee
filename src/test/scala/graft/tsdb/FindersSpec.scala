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

  test("first finder claiming a leaf path provides its intervals") {
    val f0 = Seq(("a.x", 10L, 90L)).toDF("path", "earliest", "latest")
    val f1 = Seq(("a.x", 50L, 60L), ("a.y", 5L, 7L)).toDF("path", "earliest", "latest")
    val out = Finders.federate(Seq(f0, f1)).orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a.x: duplicate leaf — finder 0 wins (L_DataGraphiteAPI.lua:382-384)
    // a.y: only finder 1 has it — its intervals survive
    assert(out.toSeq == Seq(("a.x", 10L, 90L, 0L), ("a.y", 5L, 7L, 1L)))
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
