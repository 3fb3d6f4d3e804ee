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

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** JVM-side twin of [[h60]] for typed/streaming code that checks
    * membership against a broadcast hash set (FunctionsSpec pins the
    * bit-equality against the Column form). The first 15 hex digits of
    * the md5 are the digest's first 60 bits, so the value is the first
    * 8 bytes big-endian shifted right 4 — no hex string round-trip
    * (a per-byte format() here cost ~3 s/sample on the sf0.1 bench),
    * and the digest instance is thread-local, not per-call.
    */
  def h60Jvm(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** JVM-side twin of the tokens → distinct-n-shingles pipeline
    * ([[tokens]] + ShingleArray semantics: lower, split on single
    * space keeping empties, ordered n-grams joined by one space,
    * de-duplicated). Null/short texts → empty set.
    *
    * Lowercase contract: `Locale.ROOT` here vs Spark's `lower()` in the
    * Column twin — FunctionsSpec pins their agreement on
    * locale-sensitive samples (İ, ß, final sigma) in addition to the
    * corpus, so streaming G5 flags match the batch arithmetic beyond
    * ASCII. The DuckDB ORACLE side is a narrower ASCII contract (the
    * synthetic corpus; a third engine's lower() is not pinned).
    */
  def shinglesJvm(text: String, n: Int): Set[String] = {
    if (text == null) return Set.empty
    val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Whitespace tokenization (the synthetic corpus is single-space
    * separated; a `\s+` regex would be equivalent here).
    */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Leak-check text normalization (the Dolma/CCNet discipline):
    * case-fold, strip every non-alphanumeric glyph to a space,
    * collapse whitespace runs, trim — so trivial reformatting (case,
    * punctuation, spacing) cannot hide a contamination leak. ONE
    * source for the F15 family's normalized mode and the G5 ingest
    * gate; exact mode (no normalization) stays the default everywhere.
    * Java ∩ RE2 regexes only (the F46 portability rule).
    */
  def normalizeForMatch(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** JVM twin of [[normalizeForMatch]] for the per-row streaming path;
    * Column/JVM agreement is pinned by spec. Locale.ROOT so the
    * case-fold can never pick up Turkish-I surprises from the host.
    */
  def normalizeForMatchJvm(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim

  /** Distinct n-word shingles of a token array (≥n tokens required —
    * guard with size() upstream). `transform` over an index sequence
    * keeps this inside whole-stage codegen.
    */
  def shinglesN(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Distinct 3-word shingles (the near-dup operators' base unit). */
  def shingles3(toks: Column): Column = shinglesN(toks, 3)

  /** Per-ROW 60-bit SimHash: one compiled pass over the row's own
    * distinct-token array (graft.functions.SimHash60) — no shuffle, so
    * it serves per-event streaming AND replaces the batch explode +
    * 60-aggregate signature shuffle. Arithmetic is bit-identical to
    * the DuckDB oracle's explode pipeline (verified per document by
    * the stream_sig_dedup oracle).
    */
  def simhashRow(text: Column): Column =
    graft.functions.SimHash60.simhash(array_distinct(tokens(text)))

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
