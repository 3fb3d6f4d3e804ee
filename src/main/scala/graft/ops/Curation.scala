package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Caching._

import graft.dedup.Dedup
import graft.text.Analysis

/** End-to-end corpus curation — the production composition of the §2.F
  * operators into one staged keep/drop decision per document, the shape
  * a 100 TB training-data pipeline actually runs (filter first, dedup
  * the survivors; each stage only sees the previous stage's output).
  *
  * Stages, in order; `reason` is the FIRST failing stage:
  *   1. quality   — score (Analysis.quality, 4-dp rounded) below
  *                  `minScore` or fewer than `minTokens` tokens.
  *   2. language  — argmax stopword language (Analysis.langId) is not
  *                  `keepLang`.
  *   3. exact_dup — not the min-doc_id keeper of its md5(text) group
  *                  (computed among stage-1/2 survivors).
  *   4. near_dup  — simhash star-cluster non-representative
  *                  (Dedup.simhashClusters over the exact keepers).
  *   5. kept      — survived everything; `kept` = 1.
  *
  * Distributed shape: per-doc signals join on doc_id (co-partitioned
  * shuffles); the only pairwise work is the df-capped simhash band join
  * inherited from Dedup — already bounded per bucket regardless of
  * corpus size. Output is O(n) rows (doc_id, kept, reason).
  */
object Curation {

  /** Cache lifecycle: the narrow gate/keeper intermediates below are
    * cached for the plan's double consumption and not unpersisted — a
    * long-lived session should `spark.catalog.clearCache()` between
    * invocations (see the note on [[graft.dedup.Dedup]]).
    */
  def curate(spark: SparkSession, docs: DataFrame,
             minScore: Double, minTokens: Int, keepLang: String,
             maxHamming: Int, maxDf: Int): DataFrame =
    curateCore(spark, docs, minScore, minTokens, keepLang, maxHamming, maxDf)
      .orderBy(col("doc_id"))

  /** [[curate]] without the presentation sort — the composition shape
    * ([[curateWithDecontam]] consumes the decision table mid-pipeline,
    * where a range-exchange + sort is pure waste; the composed query
    * sorts once at its own tail).
    */
  private def curateCore(spark: SparkSession, docs: DataFrame,
                         minScore: Double, minTokens: Int, keepLang: String,
                         maxHamming: Int, maxDf: Int): DataFrame = {
    // stages 1+2 are per-row functions of text: ONE scan computes both
    // gate booleans (Analysis.withGateCols) — r12: the previous shape
    // joined TWO corpus-wide projections (quality ⋈ langId on doc_id)
    // and then joined the text back against the narrow gate table; both
    // joins disappear (guide §2.4 — a per-row predicate never needs a
    // shuffle). Every cached/reused intermediate stays NARROW (ids +
    // flags) — the text column is never cached; each stage that needs
    // it re-reads the column-pruned scan, the only shape that survives
    // a 100 TB corpus (gates: 1 long + 2 booleans per doc).
    val staged = Analysis.withGateCols(docs, minScore, minTokens, keepLang)
    val gates = staged.select(col("doc_id"), col("q_pass"), col("l_pass"))
      .cachedOnce
    // gate-survivor keeper: min doc_id per content hash. The gate is
    // re-evaluated per-row on the survivor scan instead of joining the
    // cached gate table back onto text — recomputing two token-array
    // aggregates per row is far cheaper at any scale than shuffling
    // the corpus text by doc_id.
    val sv = staged.filter(col("q_pass") && col("l_pass"))
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
    val keepers = sv.groupBy(col("content_md5")).agg(min(col("doc_id")).as("keep_id"))
    // consumed twice (near-dup input + final reason join): 2 longs/doc
    val exKeep = sv.join(keepers, "content_md5")
      .select(col("doc_id"), col("keep_id"))
      .cachedOnce
    val keeperDocs = docs.select(col("doc_id"), col("text"))
      .join(exKeep.filter(col("doc_id") === col("keep_id")).select(col("doc_id")), "doc_id")
    val nd = Dedup.simhashClusters(spark, keeperDocs, maxHamming, maxDf)
      .select(col("doc_id"), col("keep").as("nd_keep"))
    // null keep_id/nd_keep = the doc never reached that stage; the
    // CASE's earlier arms have already claimed it
    gates
      .join(exKeep, Seq("doc_id"), "left")
      .join(nd, Seq("doc_id"), "left")
      .withColumn("reason",
        when(!col("q_pass"), "quality")
          .when(!col("l_pass"), "language")
          .when(col("doc_id") =!= col("keep_id"), "exact_dup")
          .when(col("nd_keep") === 0, "near_dup")
          .otherwise("kept"))
      .select(col("doc_id"),
        when(col("reason") === "kept", 1L).otherwise(0L).as("kept"),
        col("reason"))
  }

  /** F14b: the full pipeline INCLUDING train/eval decontamination —
    * [[curate]]'s four stages, then stage 5: a surviving document
    * sharing ≥ `minHits` distinct `n`-gram shingles with the benchmark
    * suite flips to (kept 0, reason 'contaminated'). Composition, not
    * reimplementation: the base stages are the [[curate]] plan verbatim
    * and the contamination test is [[Dedup.decontaminate]] run over
    * the stage-4 SURVIVORS (filter first, check the expensive overlap
    * only on what would actually ship — the same
    * cheapest-gate-first ordering as the base stages; the shingle df
    * cap is computed over the survivor corpus, exactly the semantics
    * of running the F15 operator on the curated set).
    *
    * A benchmark item drawn from the corpus itself is flagged BY
    * DESIGN (it shares all its shingles with its eval twin): the
    * benchmark must not be trained on, which is the whole point of
    * the stage.
    */
  def curateWithDecontam(spark: SparkSession, docs: DataFrame, evalDocs: DataFrame,
                         minScore: Double, minTokens: Int, keepLang: String,
                         maxHamming: Int, maxDf: Int,
                         n: Int, minHits: Int, decontamMaxDf: Int): DataFrame = {
    // narrow (id, kept, reason) — consumed twice (survivor filter +
    // the final flag join); the UNSORTED core, so no mid-pipeline
    // range exchange
    val base = curateCore(spark, docs, minScore, minTokens, keepLang,
      maxHamming, maxDf).cachedOnce
    val keptDocs = docs.select(col("doc_id"), col("text"))
      .join(base.filter(col("kept") === 1L).select(col("doc_id")), "doc_id")
    val contaminated = Dedup.decontaminate(keptDocs, evalDocs, n, minHits, decontamMaxDf)
      .select(col("doc_id")).distinct()
      .withColumn("cont", lit(1L))
    base.join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("cont").isNotNull, 0L).otherwise(col("kept")).as("kept"),
        when(col("cont").isNotNull, lit("contaminated")).otherwise(col("reason"))
          .as("reason"))
      .orderBy(col("doc_id"))
  }
}
