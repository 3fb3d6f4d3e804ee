package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over the document corpus
  * (SURVEY.md §2.F21, VERDICT r5 #4) — the step a tokenizer-training
  * pipeline runs on top of corpus_vocab's counts: N iterations of
  * "count adjacent symbol pairs, merge the most frequent".
  *
  * Plan family: the working set is the DISTINCT-WORD frequency table
  * (vocabulary-sized — the corpus-sized explode happens once, then
  * every iteration runs over ~|vocab| rows, the same K-rows-not-corpus
  * argument as the Lloyd codebook in Ann.ivfTopKRefined). Each
  * iteration is ONE map-side-combined pair-count aggregate, a top-1
  * selection (a bounded single-row collect — the merge decision IS the
  * iteration's output, the exact analogue of the G5 benchmark-set
  * broadcast), and a map-only rewrite of the symbol sequences.
  *
  * Engine portability: symbol sequences are delimiter-wrapped strings —
  * each symbol as ␟sym␟, concatenated — so one merge step is a plain
  * `replace(s, '␟a␟␟b␟', '␟ab␟')`, whose left-to-right non-overlapping
  * scan IS the greedy BPE merge rule in both Spark and DuckDB
  * ('␟a␟␟a␟␟a␟␟a␟' → '␟aa␟␟aa␟', verified both engines; the doubled
  * delimiter prevents the shared-boundary false overlap a single
  * delimiter allows). The tie-break is pinned: count desc, then left
  * symbol, then right symbol, binary collation in both engines.
  */
object Bpe {

  /** Symbol delimiter — U+241F, absent from the corpus by construction
    * (spec-checked); tokens are space-free because words come from a
    * space split.
    */
  val D = "␟"

  /** (word, freq) vocabulary with per-char wrapped symbol strings. */
  private def wordSeqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        regexp_replace(col("word"), "(.)", s"$D$$1$D").as("s"))

  /** Adjacent symbol-pair counts over the current sequences, weighted
    * by word frequency (every occurrence inside a word counts).
    */
  private def pairCounts(seqs: DataFrame): DataFrame =
    seqs
      .select(col("freq"), split(trim(col("s"), D), s"$D$D").as("a"))
      // single-symbol words carry no pairs — and sequence(1, 0) counts
      // DOWN in Spark rather than yielding an empty range
      .filter(size(col("a")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(a) - 1), " +
          "i -> struct(element_at(a, i) AS lhs, element_at(a, i + 1) AS rhs))")).as("p"))
      .select(col("freq"), col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .groupBy(col("lhs"), col("rhs")).agg(sum(col("freq")).as("cnt"))

  /** N BPE merge iterations; returns the merge table
    * (step, lhs, rhs, cnt) — the trained artifact a tokenizer ships.
    */
  def merges(spark: SparkSession, docs: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    mergeRows(spark, docs, n).toDF("step", "lhs", "rhs", "cnt").orderBy(col("step"))
  }

  /** The same training loop, returning the merge table driver-side —
    * the bounded artifact (N rows by construction) that [[applyTokens]]
    * and the streaming tokenizer ship as expression literals.
    */
  def mergeRows(spark: SparkSession, docs: DataFrame, n: Int): Seq[(Long, String, String, Long)] = {
    require(n >= 1, s"need at least one merge step (got $n)")
    var seqs = wordSeqs(docs).cache()
    seqs.count()
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (step <- 1 to n) {
      // bounded single-row action: the argmax pair is this iteration's
      // entire output (and the next rewrite's constant)
      val top = pairCounts(seqs)
        .orderBy(desc("cnt"), asc("lhs"), asc("rhs")).limit(1).collect()
      require(top.nonEmpty, s"no pairs left to merge at step $step")
      val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += ((step.toLong, l, r, c))
      val next = seqs.select(col("word"), col("freq"),
        call_function("replace", col("s"),
          lit(D + l + D + D + r + D), lit(D + l + r + D)).as("s")).cache()
      next.count() // materialize before dropping the parent cache
      seqs.unpersist()
      seqs = next
    }
    seqs.unpersist()
    out.toSeq
  }

  /** F21c: apply a trained merge table to the corpus — the map-only
    * tokenize pass an ingest pipeline runs with a FROZEN tokenizer.
    *
    * The whole document is delimiter-wrapped in one projection (every
    * non-space char becomes ␟c␟; raw spaces stay bare), then the N
    * merges run as N literal `replace`s. A merge pattern ␟a␟␟b␟ needs
    * the doubled delimiter at the junction, which a bare space never
    * provides — so whole-document application is EXACTLY per-word
    * application (spec-pinned), with no explode, no word join, no
    * shuffle: one narrow projection over the corpus scan.
    *
    * Outputs are all integers (token counts and a basis-point
    * compression ratio via integer division) so the cross-engine
    * comparison never rides a float rounding boundary.
    */
  def applyTokens(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val wrapped = regexp_replace(lower(col("text")), "([^ ])", s"$D$$1$D")
    val tokenized = merges.foldLeft(wrapped) { case (s, (l, r)) =>
      call_function("replace", s, lit(D + l + D + D + r + D), lit(D + l + r + D))
    }
    docs.select(
      col("doc_id"),
      ((length(tokenized) - length(call_function("replace", tokenized, lit(D), lit("")))) / 2)
        .cast("long").as("n_tokens"),
      length(call_function("replace", lower(col("text")), lit(" "), lit("")))
        .cast("long").as("n_base_syms"))
      .withColumn("compression_bp", // nullif: an all-space doc has no tokens
        expr("coalesce((n_base_syms * 10000) div nullif(n_tokens, 0), 0)").cast("long"))
  }
}
