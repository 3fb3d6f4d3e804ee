package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash primitives for the LLM-pipeline operators.
  *
  * All hashing is md5-based so Spark and the DuckDB oracle compute
  * bit-identical values (SURVEY.md §3): `h60(s)` is the first 15 hex
  * digits of md5 as a positive 60-bit long —
  * `conv(substr(md5(s),1,15),16,10)` ⇔ `('0x'||substr(md5(s),1,15))::BIGINT`.
  */
object TextFns {

  /** 60-bit positive md5-derived hash. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** h60 reduced mod a 31-bit prime: products with <2^31 multipliers
    * stay inside a signed 64-bit long (no overflow on either engine).
    */
  val P31 = 2147483647L
  def h31(c: Column): Column = h60(c) % P31

  /** Whitespace tokenization (the synthetic corpus is single-space
    * separated; a `\s+` regex would be equivalent here).
    */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct 3-word shingles of a token array (≥3 tokens required —
    * guard with size() upstream). `transform` over an index sequence
    * keeps this inside whole-stage codegen.
    */
  def shingles3(toks: Column): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", slice(toks, i + 1, lit(3)))))

  /** Per-ROW 60-bit SimHash — identical arithmetic to the distributed
    * `Dedup.simhash` (explode + groupBy bit sums) but evaluated as one
    * scalar expression over the row's own token array, so it needs NO
    * shuffle: the shape a per-event streaming pipeline requires.
    * HOFs are interpreted (not codegen'd) in Spark 4, which is the
    * price of per-row evaluation; the batch operator keeps the
    * codegen'd aggregate form.
    */
  def simhashRow(text: Column): Column = {
    val hs = transform(array_distinct(tokens(text)), h60 _)
    val bitIdx = sequence(lit(0), lit(59))
    // one pass over the tokens accumulating all 60 signed bit counts
    val counts = aggregate(hs, array_repeat(lit(0), 60), (acc, h) =>
      zip_with(acc, bitIdx, (a, j) =>
        a + when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L,
          lit(1)).otherwise(lit(-1))))
    aggregate(
      zip_with(counts, bitIdx, (c, j) =>
        when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
  }

  /** Same tiny per-language stopword dictionaries on both engines. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "mit", "von", "zu", "auf"),
    "es" -> Seq("el", "los", "y", "un", "una", "es", "por", "como", "para", "su"),
    "fr" -> Seq("le", "les", "et", "une", "des", "est", "dans", "pour", "que", "au"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "人", "这"))

  /** In-array stopword hit count (with repeats): codegen'd
    * size(filter(...)) rather than a UDF.
    */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => x.isin(words.map(w => w: Any): _*)))
}
