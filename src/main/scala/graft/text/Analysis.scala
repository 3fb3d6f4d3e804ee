package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    import spark.implicits._
    val dict = broadcast(
      stopwords.toSeq.flatMap { case (l, ws) => ws.map(w => (l, w)) }.toDF("lang_cand", "word"))
    val hits = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(dict, col("tok") === col("word"))
      .groupBy(col("doc_id"), col("lang_cand"))
      .agg(count(lit(1)).as("hits"))
    // argmax as a min_by AGGREGATE over (-hits, lang): partial
    // aggregation collapses the ≤5 language rows per doc map-side —
    // no window shuffle-and-sort
    val best = hits.groupBy(col("doc_id"))
      .agg(min_by(struct(col("lang_cand"), col("hits")),
        struct((-col("hits")).as("nh"), col("lang_cand"))).as("b"))
      .select(col("doc_id"), col("b.lang_cand").as("lang_cand"), col("b.hits").as("hits"))
    docs.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang_cand"), lit("unknown")).as("pred_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
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
    * fp = Σ_i (h31(tok_i)·i) mod P  (i is 1-based), all mod P=1e9+7.
    * Order-sensitive content hash; commutative summation keeps it
    * shuffle-friendly (no ordered aggregation needed).
    */
  val FpP = 1000000007L
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        ((h60(col("tok")) % FpP) * (col("pos") + 1) % FpP).as("term"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % FpP).as("fp"))
      .orderBy(col("doc_id"))
}
