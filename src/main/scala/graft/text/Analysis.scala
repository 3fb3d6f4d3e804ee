package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fingerprint60
import TextFns._

/** Text-analysis operators for training-data pipelines
  * (SURVEY.md §2.F7-F10). Everything is built from codegen'd
  * `functions._` / lambda expressions — no UDFs in the hot path.
  */
object Analysis {

  /** F7: stopword-hit language ID. Score = stopword occurrences (with
    * repeats) per language; argmax with lexicographic tie-break; no
    * hits → 'unknown'. One shuffle keyed by (doc, lang) after a
    * broadcast join against the tiny dictionary.
    */
  def langId(spark: SparkSession, docs: DataFrame): DataFrame = {
    // fully per-row: one codegen'd in-array hit count per language (5
    // langs × 10 words), argmax by an alphabetically-ordered when
    // chain — the first language reaching the max implements the
    // (hits DESC, lang ASC) tie-break. No explode, no join, no shuffle.
    val toks = tokens(col("text"))
    val langs = stopwords.keys.toSeq.sorted
    val hitCols = langs.map(l => stopwordHits(toks, stopwords(l)).cast("long").as(s"h_$l"))
    val scored = docs.select(col("doc_id") +: hitCols: _*)
    val maxHits = greatest(langs.map(l => col(s"h_$l")): _*)
    val pred = langs.foldRight(lit("unknown")) { (l, rest) =>
      when(col(s"h_$l") === maxHits, l).otherwise(rest)
    }
    // null text → null hit counts; coalesce to the ('unknown', 0) the
    // explode+join formulation (and the DuckDB oracle's LEFT JOIN)
    // produce for a doc with no tokens
    scored
      .select(col("doc_id"),
        coalesce(when(maxHits === 0, "unknown").otherwise(pred), lit("unknown"))
          .as("pred_lang"),
        coalesce(maxHits, lit(0L)).as("hits"))
      .orderBy(col("doc_id"))
  }

  /** F8: quality scoring from length / token-dup / stopword signals.
    * score = 0.3·min(n_tokens/100,1) + 0.3·(1−dup_ratio)
    *       + 0.2·stopword_ratio + 0.2·min(avg_tok_len/10,1)
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val dupRatio = lit(1.0) - size(array_distinct(toks)) / nTok
    val swRatio = stopwordHits(toks, stopwords("en")) / nTok
    val avgTokLen = (length(col("text")) - (nTok - 1)) / nTok // chars minus separators
    val score =
      lit(0.3) * least(nTok / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - dupRatio) +
        lit(0.2) * swRatio +
        lit(0.2) * least(avgTokLen / 10.0, lit(1.0))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      round(dupRatio - 1e-9, 4).as("dup_ratio"),
      round(swRatio - 1e-9, 4).as("stopword_ratio"),
      round(score - 1e-9, 4).as("score"))
      .orderBy(col("doc_id"))
  }

  /** F8b: within-document repetition — the duplicate n-gram fraction
    * from the Gopher/MassiveText-style quality rule family, over 2- and
    * 3-word shingles: rep_k = 1 − distinct_k / total_k with
    * total_k = max(n_tokens − k + 1, 0) (docs too short for a shingle
    * score 0). Distinct from [[quality]]'s token-level dup_ratio: this
    * catches PHRASE loops (boilerplate, templated spam) that unique
    * token counts miss. The distinct-shingle count is the compiled
    * [[graft.functions.ShingleDistinct]] pass (the declarative
    * higher-order-function form is interpreted, ~8× slower) — at
    * 100 TB this is a map-only scan, no shuffle anywhere. Null text
    * propagates null (no reference semantics to preserve here).
    */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    def rep(k: Int) = {
      val total = greatest(n - (k - 1), lit(0))
      // explicit null-text arm: greatest() SKIPS nulls, so without it a
      // null doc would fall into the total=0 branch and score 0.0 —
      // indistinguishable from a genuinely repetition-free doc
      when(col("text").isNull, lit(null).cast("double"))
        .when(total === 0, lit(0.0))
        .otherwise(
          lit(1.0) -
            graft.functions.ShingleDistinct.distinctShingles(toks, k)
            / total.cast("double"))
    }
    docs.select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      round(rep(2) - 1e-9, 4).as("rep2"),
      round(rep(3) - 1e-9, 4).as("rep3"))
      .orderBy(col("doc_id"))
  }

  /** F9: whitespace vs BPE-ish regex token counts. The regex splits
    * letter runs, digit runs, and single other-glyphs — a cheap proxy
    * for subword tokenizer cost accounting.
    */
  val bpeLikePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      size(expr(s"regexp_extract_all(text, '$bpeLikePattern', 0)")).cast("long").as("re_tokens"))
      .orderBy(col("doc_id"))

  /** F10: positional rolling fingerprint
    * fp = Σ_i (h60(tok_i) mod P)·i mod P  (i is 1-based), P=1e9+7.
    * Order-sensitive content hash, computed as ONE compiled per-row
    * pass over the ordered token array (graft.functions.Fingerprint60)
    * — no posexplode/groupBy shuffle.
    */
  val FpP = Fingerprint60.P
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        Fingerprint60.fingerprint(tokens(col("text"))).as("fp"))
      .orderBy(col("doc_id"))

  /** F17: corpus vocabulary statistics — the counting pass a tokenizer
    * training run (BPE/unigram) makes over its corpus: term frequency
    * and document frequency per token, top `topN` by tf with a token
    * tie-break (deterministic cutoff). Scale shape: ONE explode +
    * groupBy(token) with map-side partial aggregation (tf is a plain
    * count; df an approx-free count-distinct over doc_id — Spark plans
    * it as a two-phase expand, still keyed by token, no hot key unless
    * a token dominates the corpus, which the top-N output makes
    * visible rather than pathological); the top-N is a TakeOrdered, not
    * a global sort.
    */
  def vocab(docs: DataFrame, topN: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(topN)
}
