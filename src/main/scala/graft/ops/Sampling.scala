package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting (SURVEY.md §2.F18) — the held-out
  * assignment a training pipeline needs to be STABLE: a document's
  * split must never change when the corpus grows, shrinks, or is
  * re-partitioned, or eval contamination silently creeps in. So the
  * split is a pure function of the document id — md5-derived
  * (`TextFns.h60`, the engine-portable hash every other operator uses)
  * modulo the weight denominator — not `randomSplit`, whose assignment
  * depends on partitioning and seed plumbing.
  *
  * Scale shape: the assignment itself is map-only — no shuffle, no
  * join, no state; the split column streams out of the scan stage at
  * any corpus size. (The driver entry's trailing orderBy is
  * presentation/oracle determinism only — drop it when consuming the
  * split as a pipeline stage.)
  */
object Sampling {

  /** One (id, split) row per input row: `weights` are (name, share)
    * pairs, e.g. Seq(("train", 8), ("val", 1), ("test", 1)); the id's
    * 60-bit md5 hash modulo the share sum picks the bucket range.
    */
  def split(docs: DataFrame, weights: Seq[(String, Int)],
            idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive (got $weights)")
    val denom = weights.map(_._2).sum.toLong
    val bucket = graft.text.TextFns.h60(col(idCol).cast("string")) % denom
    // cumulative upper bounds → first-match when chain
    val uppers = weights.scanLeft(0L) { case (acc, (_, w)) => acc + w }.tail
    val splitCol: Column = weights.zip(uppers).init
      .foldRight(lit(weights.last._1)) { case (((name, _), upper), rest) =>
        when(bucket < upper, name).otherwise(rest)
      }
    docs.select(col(idCol), bucket.as("bucket"), splitCol.as("split"))
      .orderBy(col(idCol))
  }

  /** F24: deterministic weighted mixture sampling — the rebalancing
    * stage a training pipeline runs over a multi-source/multi-language
    * crawl (upsample the curated slice, downsample the bulk): each
    * stratum (value of `strataCol`) keeps a fixed fraction of its
    * documents, expressed in BASIS POINTS (integer ten-thousandths, so
    * the keep test is pure integer arithmetic — no float thresholds to
    * diverge between engines).
    *
    * Keep is a pure function of the document id, like [[split]] — a
    * doc's sampling fate never changes under corpus growth or
    * repartitioning — but hashed with a '#sample' SALT so the sample
    * is decorrelated from the F18 split assignment (the same h60 would
    * otherwise make "test" docs systematically likelier to survive
    * sampling at rate boundaries). Unknown strata fall back to
    * `defaultBp`. Map-only: no shuffle, no join; `keep` streams out of
    * the scan.
    */
  def sampleByStratum(docs: DataFrame, ratesBp: Seq[(String, Int)],
                      defaultBp: Int, strataCol: String = "lang",
                      idCol: String = "doc_id"): DataFrame = {
    require(ratesBp.forall { case (_, bp) => bp >= 0 && bp <= 10000 },
      s"rates are basis points in [0, 10000] (got $ratesBp)")
    require(defaultBp >= 0 && defaultBp <= 10000,
      s"defaultBp in [0, 10000] (got $defaultBp)")
    val bucket = graft.text.TextFns
      .h60(concat(col(idCol).cast("string"), lit("#sample"))) % 10000L
    val rateCol = ratesBp.foldRight(lit(defaultBp.toLong)) {
      case ((name, bp), rest) =>
        when(col(strataCol) === name, bp.toLong).otherwise(rest)
    }
    docs.select(col(idCol), col(strataCol), bucket.as("bucket"),
      rateCol.as("rate_bp"),
      when(bucket < rateCol, 1L).otherwise(0L).as("keep"))
      .orderBy(col(idCol))
  }
}
