package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Caching._

import graft.text.TextFns._

/** Document deduplication operators (SURVEY.md §2.F1-F4).
  *
  * Every candidate-generation step goes through a bucketing key
  * (content hash, shingle, band signature) so the pairwise work is an
  * equi-join shuffled by bucket — never an O(n²) cross join. That is
  * the property that holds at 100 TB: the only all-pairs computation
  * happens *within* buckets that true near-duplicates must share.
  *
  * Cache lifecycle: operators here `.cachedOnce` narrow intermediates that
  * their plans consume twice (shingle sets, signature maps, band keys).
  * The handles are plan-internal, so they are NOT unpersisted when the
  * returned DataFrame is consumed — a long-lived session invoking these
  * repeatedly should `spark.catalog.clearCache()` between invocations
  * (Verify/Bench already do), or the cached blocks accumulate in
  * executor storage until LRU eviction.
  */
object Dedup {

  /** F1: exact dedup by md5(text); keeper = min doc_id per group. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("keep_id"))

  /** Distinct (id, shingle) pairs for docs with ≥n tokens (the shingle
    * build is the compiled ShingleArray pass — the declarative HOF
    * chain is interpreted). The n-gram family uses the 3-gram default;
    * decontamination widens to 5.
    */
  def docShingles(docs: DataFrame, n: Int = 3, idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol),
        explode(graft.functions.ShingleArray.shingles(col("toks"), n)).as("shingle"))

  /** F2: pairwise Jaccard over 3-word shingles via shingle equi-join.
    * intersection counts come from the join; union = |A|+|B|−∩.
    */
  def ngramJaccard(docs: DataFrame, tau: Double): DataFrame = {
    // cached: the plan references the shingle set three times (both
    // join sides + sizes); without the cache each reference re-runs
    // tokenize+explode over the corpus
    val sh = docShingles(docs).cachedOnce
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("x") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("y") === col("sb.doc_id"))
      .withColumn("jaccard", col("i") / (col("sa.n") + col("sb.n") - col("i")))
      .filter(col("jaccard") >= tau)
      // -1e-9 before round: integer-ratio values can sit exactly on
      // .xxxx5 boundaries (graft.tsdb.Queries.Eps rationale)
      .select(col("x"), col("y"), round(col("jaccard") - 1e-9, 4).as("jaccard"))
      .orderBy(col("x"), col("y"))
  }

  /** Scale-path variant of ngramJaccard: shingles appearing in more
    * than `maxDf` documents are dropped before the pair join. At 100 TB
    * stop-shingles dominate join fan-out (a shingle in d docs yields
    * d²/2 candidate pairs) while contributing nothing discriminative;
    * a pair at Jaccard ≥ τ shares many shingles, so it survives unless
    * ALL its shared shingles are high-frequency. Documented
    * approximation — the exact operator stays `ngramJaccard`.
    */
  def ngramJaccardCapped(docs: DataFrame, tau: Double, maxDf: Int): DataFrame = {
    // four plan references (df counts, both capped sides, sizes)
    val sh = docShingles(docs).cachedOnce
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("shingle"))
    val shCapped = sh.join(rare, "shingle")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = shCapped.as("a")
      .join(shCapped.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("x") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("y") === col("sb.doc_id"))
      .withColumn("jaccard", col("i") / (col("sa.n") + col("sb.n") - col("i")))
      .filter(col("jaccard") >= tau)
      .select(col("x"), col("y"), round(col("jaccard") - 1e-9, 4).as("jaccard"))
      .orderBy(col("x"), col("y"))
  }

  /** F15: train/eval decontamination — (corpus doc, eval doc) pairs
    * sharing ≥ `minHits` distinct n-word shingles, the overlap check a
    * pretraining pipeline runs against its benchmark suites before
    * training. The reference has no eval concept; this extends the §2.F
    * family with the standard n-gram contamination method.
    *
    * Scale shape: both sides reduce to distinct (id, shingle), and the
    * benchmark-sized eval shingle set is BROADCAST as the very first
    * join — corpus rows on non-eval shingles die map-side, so the one
    * corpus-side pass shuffles only the eval-matched subset. The df cap
    * (a stop-shingle carries no contamination signal but dominates
    * fan-out — the [[ngramJaccardCapped]] cap argument) is computed on
    * that subset, where it equals full-corpus df for exactly the
    * shingles that can pair. Output is one row per overlapping pair:
    * O(contamination), not O(corpus).
    */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame, n: Int,
                    minHits: Int, maxDf: Int): DataFrame = {
    // cached: the eval shingle pipeline is consumed twice (the distinct
    // shingle-set broadcast and the final pair join) and is
    // benchmark-sized by construction
    val ev = docShingles(evalDocs.select(col("eval_id"), col("text")), n, "eval_id").cachedOnce
    // eval-matched corpus rows only; consumed twice (df + pair join)
    // but already contamination-sized, the only cacheable shape here
    val hit = docShingles(corpus, n)
      .join(broadcast(ev.select(col("shingle")).distinct()), "shingle")
      .cachedOnce
    // per-shingle doc counts over `hit` == full-corpus df for these
    // shingles (the semijoin dropped no corpus row of an eval shingle)
    val rare = hit.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("shingle"))
    hit.join(broadcast(rare), "shingle")
      .join(broadcast(ev), "shingle")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** F15n: NORMALIZATION-AWARE decontamination — [[decontaminate]]
    * over [[graft.text.TextFns.normalizeForMatch]]ed text on both
    * sides: real leak checks (Dolma, CCNet) case-fold and strip
    * punctuation before shingling, because a benchmark answer pasted
    * into a crawl rarely survives verbatim — exact space-token
    * shingles provably miss a copy that merely changed case or
    * punctuation (the planted spec). The exact mode stays the F15
    * default; this is the mode a suite owner actually signs off on.
    * Same scale shape (the normalization is one extra map-only Column
    * before the shared shingle chain).
    */
  def decontaminateNormalized(corpus: DataFrame, evalDocs: DataFrame,
                              n: Int, minHits: Int, maxDf: Int): DataFrame =
    decontaminate(
      corpus.select(col("doc_id"),
        graft.text.TextFns.normalizeForMatch(col("text")).as("text")),
      evalDocs.select(col("eval_id"),
        graft.text.TextFns.normalizeForMatch(col("text")).as("text")),
      n, minHits, maxDf)

  /** F15d: PER-BENCHMARK contamination report — a suite owner runs
    * decontamination against MANY benchmarks at once and signs off
    * per benchmark, not per pair: the F15 pair machinery runs once
    * over the union of all eval slices (one shingle pass, one
    * broadcast — K benchmarks cost what one does), then pairs roll up
    * by the eval docs' benchmark id into the per-suite verdict row
    * (how many corpus docs are contaminated against THIS benchmark,
    * how many leaking pairs, the worst overlap). Output is
    * O(#benchmarks).
    */
  def decontaminateMulti(corpus: DataFrame, evalDocs: DataFrame, n: Int,
                         minHits: Int, maxDf: Int): DataFrame = {
    val pairs = decontaminate(corpus,
      evalDocs.select(col("eval_id"), col("text")), n, minHits, maxDf)
    pairs.join(broadcast(evalDocs.select(col("eval_id"), col("bench_id"))),
        Seq("eval_id"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("doc_id")).as("n_contaminated"),
        count(lit(1)).as("n_pairs"), max(col("hits")).as("max_hits"))
      .orderBy(col("bench_id"))
  }

  /** F15b: eval-direction contamination FRACTION — for each eval doc,
    * the share of its distinct n-gram shingles that appear in some
    * OTHER corpus document, in basis points. This is the direction the
    * F15 pair report doesn't give: a benchmark task is compromised when
    * most of ITS grams leak into training, regardless of how large the
    * leaking train doc is (the GPT-3/Lee-et-al contamination metric a
    * suite owner thresholds on before trusting an eval number).
    *
    * Self-exclusion matters because the eval suite is drawn from the
    * corpus here: a gram whose only corpus occurrence is the eval doc
    * itself is no leak. Per-gram corpus evidence reduces to
    * (occurrence count, min doc_id) — ≥2 occurrences always include a
    * non-self doc; exactly one occurrence leaks iff it is someone else.
    *
    * Scale shape: the eval gram set is benchmark-sized and BROADCAST;
    * corpus rows on non-eval shingles die map-side, so the only
    * shuffle over corpus-derived data is a map-side-combinable
    * count/min aggregate on the contamination-sized hit subset (rows
    * are already per-doc-distinct, so count(*) IS the doc count — no
    * count-distinct expansion). Output is O(|eval|); all-integer
    * columns (basis points by integer division), no float boundary.
    */
  def decontaminateOverlap(corpus: DataFrame, evalDocs: DataFrame, n: Int): DataFrame = {
    val ev = docShingles(evalDocs.select(col("eval_id"), col("text")), n, "eval_id").cachedOnce
    val hits = docShingles(corpus, n)
      .join(broadcast(ev.select(col("shingle")).distinct()), "shingle")
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("d0"))
    ev.join(hits, Seq("shingle"), "left")
      .select(col("eval_id"),
        when(col("n_docs").isNull, 0L)
          .when(col("n_docs") >= 2 || col("d0") =!= col("eval_id"), 1L)
          .otherwise(0L).as("hit"))
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("hit")).as("hit_grams"))
      .withColumn("contamination_bp",
        expr("coalesce((hit_grams * 10000) div nullif(n_grams, 0), 0)").cast("long"))
      .orderBy(col("eval_id"))
  }

  /** F15c: FUZZY decontamination — eval leakage detection through the
    * MinHash band machinery instead of exact n-gram overlap: a
    * paraphrased / lightly-perturbed copy of a benchmark item shares
    * few exact 5-grams with its source (the F15 check misses it) but
    * still collides with it in MinHash LSH space. Candidates are
    * (corpus doc, eval doc) pairs agreeing on ≥1 of the 4 band hashes;
    * each candidate is scored by the F3e slot-agreement Jaccard
    * estimate (matches/12 — each slot agrees with probability exactly
    * J) and kept at ≥ `minMatches` agreeing slots.
    *
    * Scale shape: the eval side is benchmark-sized by contract, so its
    * band rows (WITH the 12-slot signature attached — 4 rows/doc) are
    * one BROADCAST; corpus band rows join map-side and die immediately
    * unless they hit an eval bucket, the slot estimate is computed
    * per collision row from the two in-row signatures (no second join
    * anywhere), and sub-threshold rows are filtered BEFORE the only
    * shuffle — a map-side-combinable first-value aggregate on the
    * O(contamination) hit set. The corpus is touched exactly once,
    * map-only; contrast [[minhashLsh]], whose self-join this
    * cross-table shape never performs.
    */
  def decontaminateFuzzy(corpus: DataFrame, evalDocs: DataFrame,
                         minMatches: Int): DataFrame = {
    val k = minhashParams.size
    require(minMatches >= 1 && minMatches <= k,
      s"minMatches in [1, $k] (got $minMatches)")
    val cb = minhashBandRowsWithSig(corpus)
    val eb = minhashBandRowsWithSig(
      evalDocs.select(col("eval_id").as("doc_id"), col("text")))
      .select(col("doc_id").as("eval_id"), col("band"), col("bh"),
        col("mh").as("emh"))
    val matches = (1 to k).map(i =>
      when(element_at(col("mh"), i) === element_at(col("emh"), i), 1)
        .otherwise(0)).reduce(_ + _)
    cb.join(broadcast(eb), Seq("band", "bh"))
      .filter(col("doc_id") =!= col("eval_id"))
      .withColumn("matches", matches)
      .filter(col("matches") >= minMatches)
      .groupBy(col("doc_id"), col("eval_id"))
      // matches is pair-constant (both sigs are functions of the ids):
      // max() is just the shuffle-free way to collapse band duplicates
      .agg(max(col("matches")).as("m"))
      .select(col("doc_id"), col("eval_id"),
        round(col("m") / lit(k.toDouble), 4).as("est_jaccard"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** Per-doc (doc_id, band, bh, mh) — [[minhashBands]] keeping the full
    * signature on the row, so a cross-table band collision can score
    * the pair without any signature re-join.
    */
  private def minhashBandRowsWithSig(docs: DataFrame): DataFrame =
    minhashSigRows(docs)
      .select(col("doc_id"), col("mh"),
        posexplode(array((0 until minhashNBands).map(b => minhashKeyCol(b, 0)): _*))
          .as(Seq("band", "bh")))

  /** F16: exact-substring dedup — the 50-token-overlap rule of Lee et
    * al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), the mode the reference's n-gram Jaccard family only
    * approximates: two documents are duplicates iff they share a
    * VERBATIM `w`-token span, regardless of how different the rest of
    * the text is (a boilerplate header, a quoted paragraph). Sharing a
    * span of length ≥ w ⟺ sharing at least one w-gram, so the w-gram
    * equi-join detects exactly the Lee-et-al pairs — no suffix array
    * needed for pair DETECTION (only for span extraction, out of
    * scope). `n_grams` counts the distinct shared w-grams (= span_len −
    * w + 1 for a single contiguous overlap).
    *
    * Scale shape: grams are h60-hashed BEFORE the join — the shuffle
    * carries 8-byte keys, not ~300-byte 50-token strings (md5-derived,
    * so the DuckDB oracle computes identical keys; a 60-bit collision
    * needs ~2^30 distinct grams per bucket to matter). The df cap drops
    * boilerplate grams shared by more than `maxDf` docs before the
    * pair join — the same Σdf² fan-out bound as [[ngramJaccardCapped]],
    * and at w=50 a gram above any small cap IS boilerplate.
    */
  def substringPairs(docs: DataFrame, w: Int, maxDf: Int): DataFrame = {
    // three plan references (df counts + both join sides). The
    // re-distinct AFTER hashing mirrors the oracle's `SELECT DISTINCT
    // doc_id, g` exactly: without it a within-doc 60-bit collision
    // would make n_grams disagree between engines (ADVICE r5 —
    // astronomically unlikely, but an avoidable asymmetry)
    val sh = docShingles(docs, w)
      .select(col("doc_id"), graft.text.TextFns.h60(col("shingle")).as("g"))
      .distinct()
      .cachedOnce
    val rare = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("g"))
    val shc = sh.join(rare, "g")
    shc.as("a")
      .join(shc.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("n_grams"))
      .orderBy(col("x"), col("y"))
  }

  /** F16k: O(n)-output keep/drop over the substring-overlap pair graph
    * (same one-step min-propagation rule as every cluster consumer).
    */
  def substringClusters(docs: DataFrame, w: Int, maxDf: Int): DataFrame =
    clusterize(docs.select(col("doc_id")),
      substringPairs(docs, w, maxDf).select(col("x"), col("y")))

  /** Positioned w-grams: one row per OCCURRENCE (doc_id, p, g) — not
    * per-doc-distinct like [[docShingles]] — so span geometry survives.
    * p is the 0-based token offset of the gram's first token.
    */
  private def positionedGrams(docs: DataFrame, w: Int): DataFrame =
    docs
      .select(col("doc_id"), graft.text.TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - w),
          i => graft.text.TextFns.h60(concat_ws(" ", slice(col("toks"), i + 1, lit(w))))))
          .as(Seq("p", "g")))

  /** F16s: span EXTRACTION — for each pair found by the w-gram join,
    * the LONGEST verbatim shared token span (what Lee et al. actually
    * report; [[substringPairs]] only detects). Exact, no suffix array:
    * a shared span of length L ≥ w is L−w+1 shared grams at CONSECUTIVE
    * positions along one (pa − pb) diagonal, so the longest span is the
    * longest consecutive-pa run per (x, y, diagonal) — the classic
    * gaps-and-islands `p − row_number()` trick, identical in both
    * engines (integer arithmetic only). max_span = longest run + w − 1.
    *
    * Scale shape: the same capped gram equi-join as substringPairs
    * (positions ride along as two ints); the islands window partitions
    * by (x, y, diag) — high-cardinality keys, no hot partition. Within-
    * doc gram repeats multiply occurrences across diagonals, but each
    * diagonal stays bounded by the doc length.
    */
  def substringSpans(docs: DataFrame, w: Int, maxDf: Int): DataFrame = {
    // df cap on per-doc-DISTINCT grams (same stop-gram rule as
    // substringPairs); positions of surviving grams join after
    val pg = positionedGrams(docs, w).cachedOnce
    val rare = pg.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("g"))
    val pgc = pg.join(rare, "g")
    val hits = pgc.as("a")
      .join(pgc.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        col("a.p").as("pa"), (col("a.p") - col("b.p")).as("diag"))
      .distinct()
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("x"), col("y"), col("diag")).orderBy(col("pa"))
    hits
      .withColumn("isl", col("pa") - row_number().over(iw))
      .groupBy(col("x"), col("y"), col("diag"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("x"), col("y"))
      .agg((max(col("run")) + (w - 1)).as("max_span"))
      .orderBy(col("x"), col("y"))
  }

  /** F16x: span SCRUB — the step a Lee-et-al pipeline actually ships:
    * remove each duplicated span from every doc except the one that
    * keeps it, emitting per-doc cut counts and the md5 of the scrubbed
    * text. The keeper rule needs NO pair join: a token is cut iff it
    * is covered by a w-gram occurrence whose gram's MINIMUM doc over
    * the (df-capped) corpus is a LOWER doc — "min doc keeps its copy",
    * the same keep_id convention as every cluster consumer, computed
    * as one per-gram min aggregate over the O(occurrences) gram table
    * instead of the O(pairs) join (strictly better scale shape than
    * the detection operator it complements).
    *
    * Coverage is exact without exploding w rows per gram: cut(t) ⇔
    * ∃ dup start pb ≤ t with pb + w − 1 ≥ t ⇔ running-max of span
    * ends at-or-before t reaches t — one per-doc ordered window
    * (null-skipping max, identical in both engines). Intra-doc
    * repeats are untouched (the family is inter-doc; F8b owns
    * within-doc repetition), and grams past the df cap are boilerplate
    * by the family's definition — under-cutting them is the documented
    * capped-family contract.
    */
  def substringScrub(docs: DataFrame, w: Int, maxDf: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(graft.text.TextFns.tokens(col("text"))).as(Seq("p", "tok")))
    val pg = positionedGrams(docs, w).cachedOnce
    val shw = pg.select(col("doc_id"), col("g")).distinct()
    val rare = shw.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("g"))
    val gmin = shw.join(rare, "g")
      .groupBy(col("g")).agg(min(col("doc_id")).as("gm"))
    val dst = pg.join(gmin, "g")
      .filter(col("gm") < col("doc_id"))
      .select(col("doc_id"), col("p"), (col("p") + (w - 1)).as("pe"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    toks.join(dst, Seq("doc_id", "p"), "left")
      .withColumn("run_pe", max(col("pe")).over(wr))
      .withColumn("cut",
        when(col("run_pe").isNotNull && col("run_pe") >= col("p"), 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("cut")).as("n_cut"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("cut") === 0L,
            struct(col("p").as("p"), col("tok").as("tok"))))),
          s => s.getField("tok")))).as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  /** Fixed, engine-portable MinHash parameters: k=12 permutations
    * h_i(x) = (a_i·x + b_i) mod P31, banded 4×3 for LSH (canonical
    * schedule lives in the compiled expression; single source).
    */
  val minhashParams: Seq[(Int, Long, Long)] = graft.functions.MinHash12.params
  val bandRows = 3
  val minhashNBands: Int = minhashParams.size / bandRows

  /** Per-doc 12-slot MinHash signature rows (doc_id, mh) — one compiled
    * per-row pass (graft.functions.MinHash12), no explode/groupBy
    * shuffle for the signature stage at all.
    */
  private[graft] def minhashSigRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        graft.functions.MinHash12.minhash(shingles3(col("toks"))).as("mh"))

  /** F3: MinHash signature + LSH banding → candidate pairs. Docs agree
    * on a band iff all `bandRows` signature slots match; the band
    * signature join is the scale path (shuffle keyed by band hash).
    */
  def minhashLsh(spark: SparkSession, docs: DataFrame): DataFrame = {
    // cache the per-doc band rows (nBands rows/doc — tiny): the self-join
    // otherwise evaluates the whole signature aggregation twice, because
    // the broadcast side's Exchange can't be reused against the shuffle side
    val bands = minhashBands(docs).cachedOnce
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .distinct()
      .orderBy(col("x"), col("y"))
  }

  /** Per-doc (doc_id, band, bh) band rows — the uncapped F3 shuffle key
    * (each band hash is [[minhashKeyCol]] at level 0; ScaleProbe
    * measures this table's bucket density against the capped keying).
    */
  private[graft] def minhashBands(docs: DataFrame): DataFrame =
    minhashSigRows(docs)
      .select(col("doc_id"),
        posexplode(array((0 until minhashNBands).map(b => minhashKeyCol(b, 0)): _*))
          .as(Seq("band", "bh")))

  /** Widening schedule for the df-capped MinHash variants (the exact
    * analogue of [[simhashKeyExpr]], with signature SLOTS playing the
    * role of simhash bit chunks): band `b`'s level-`j` key is the md5
    * of its own `bandRows` slots plus `j` extension slots drawn
    * round-robin from the OTHER bands. At j = 9 the slot list covers
    * all 12 slots (for band 0 in natural order — the full-signature
    * key), so level 9 is a bijection of the signature and df = 1 over
    * DISTINCT signatures. Slot lists are nested prefixes, so two sigs
    * sharing a level-k key share every coarser key and agree on the
    * level itself — the same drop-only-approximation argument as
    * [[cappedBandKeys]]. Shared by the Spark plan and the DuckDB
    * oracle (SparkEntry renders the same slot schedule as SQL).
    */
  val minhashWidenLevels = 9

  /** 0-based signature slot indices for band `b`'s level-`j` key. */
  def minhashKeySlots(b: Int, j: Int): Seq[Int] =
    (0 until bandRows).map(r => b * bandRows + r) ++
      (0 until j).map(c =>
        ((b + 1 + c / bandRows) % minhashNBands) * bandRows + (c % bandRows))

  /** md5 key over band `b`'s level-`j` slot subset of the `mh` array
    * (engine-portable: md5 of the comma-joined decimal slot values,
    * the same string the DuckDB oracle aggregates).
    */
  private def minhashKeyCol(b: Int, j: Int): org.apache.spark.sql.Column =
    md5(concat_ws(",",
      minhashKeySlots(b, j).map(i => element_at(col("mh"), i + 1).cast("string")): _*))

  /** Full-signature identity key: md5 over all 12 slots in natural
    * order (= band 0's level-9 key). Two docs share `sk` iff their
    * signatures are identical.
    */
  private[graft] def minhashSigKey: org.apache.spark.sql.Column =
    minhashKeyCol(0, minhashWidenLevels)

  /** The level-`lvl` key for band `band`, recomputed from the row's own
    * `mh`: a nested CaseWhen over the 4×10 (band, level) schedule —
    * only the matched arm's md5 evaluates. Lets the capped-keying
    * aggregate carry min(LEVEL) (a long — HashAggregate with map-side
    * combine) instead of min(struct(j, key)), which forces
    * SortAggregate (struct buffers aren't hash-aggregable) and made the
    * keying stage sort its widest intermediate twice (r12, guide §2.3).
    * Key values are unchanged: key = f(mh, band, j) is pure, and within
    * a (sk, band) group j is unique, so min(struct) ≡ key(min j).
    */
  private def minhashKeyAt(bandCol: org.apache.spark.sql.Column,
                           lvlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // the slot lists are NESTED PREFIXES (minhashKeySlots(b, j) =
    // minhashKeySlots(b, 9).take(3 + j)), so one dynamic slice of the
    // band's full 12-slot list replaces a 4×10-arm md5 CaseWhen (whose
    // codegen size measurably outweighed the aggregate win at sf0.1)
    def slotArrFor(b: Int) = array(
      minhashKeySlots(b, minhashWidenLevels)
        .map(i => element_at(col("mh"), i + 1).cast("string")): _*)
    val slotArr = (1 until minhashNBands).foldLeft(
      when(bandCol === 0, slotArrFor(0))) {
      (acc, b) => acc.when(bandCol === b, slotArrFor(b))
    }
    md5(concat_ws(",", slice(slotArr, lit(1), lvlCol + lit(3))))
  }

  /** Per-(sig, band) bucket keys with progressive df-capped widening —
    * [[cappedBandKeys]] transplanted to the MinHash family (VERDICT r5
    * #1). Input is DISTINCT signatures (sk, mh); a band bucket holding
    * more than `maxDf` of them is re-keyed with one more signature
    * slot, repeatedly, until it fits; level 9 keys are signature
    * bijections, so every bucket ends at df ≤ max(maxDf, 1) and the
    * per-bucket self-join work is bounded by maxDf²/2 REGARDLESS of
    * corpus size.
    */
  private[graft] def cappedMinhashKeys(sigs: DataFrame, maxDf: Int): DataFrame = {
    // maxDf=0 would null the min(when(...)) aggregate for every bucket
    // (df ≥ 1 always) — same loud rejection as cappedBandKeys
    require(maxDf >= 1, s"maxDf must be >= 1 (got $maxDf)")
    val n = minhashWidenLevels
    // one (band, level, key) struct per sig per band per level — 40
    // narrow rows per sig. ONE count shuffle + ONE join + ONE
    // min-struct groupBy, the 3-stage shape profiled in cappedBandKeys.
    val bjk = for (b <- 0 until minhashNBands; j <- 0 to n) yield
      struct(lit(b).as("band"), lit(j).as("j"), minhashKeyCol(b, j).as("key"))
    val exploded = sigs
      .select(col("sk"), col("mh"), explode(array(bjk: _*)).as("bjk"))
      .select(col("sk"), col("mh"), col("bjk.band").as("band"),
        col("bjk.j").as("j"), col("bjk.key").as("key"))
    val dfs = exploded.groupBy(col("band"), col("j"), col("key"))
      .agg(count(lit(1)).as("df"))
    // slot-list refinement is monotone (level-j agreement implies
    // level-(j−1) agreement) and level n has df = 1, so the min LEVEL
    // with df ≤ cap IS "the first level that fits" and always exists.
    // min over the long level hash-aggregates with a map-side combine;
    // the chosen level's key is recomputed from mh ([[minhashKeyAt]])
    exploded.join(dfs, Seq("band", "j", "key"))
      .groupBy(col("sk"), col("mh"), col("band"))
      .agg(min(when(col("df") <= maxDf, col("j"))).as("lvl0"))
      .select(col("sk"), col("band"), col("lvl0").cast("long").as("lvl"),
        minhashKeyAt(col("band"), col("lvl0")).as("bkey"))
  }

  /** Candidate signature pairs (s1 < s2 by sig key) from the df-capped
    * band join over DISTINCT signatures. Collapsing first is what makes
    * dup-heavy corpora safe: an N-doc exact-duplicate group is ONE row
    * in this join (identical-sig doc pairs are recovered by group
    * expansion at the caller, never through the band join).
    */
  private def cappedMinhashSigPairs(sigs: DataFrame, maxDf: Int): DataFrame = {
    // cached: the self-join consumes the keyed table twice
    val keyed = cappedMinhashKeys(sigs, maxDf).cachedOnce
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.lvl") === col("b.lvl") &&
          col("a.bkey") === col("b.bkey") && col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("s1"), col("b.sk").as("s2"))
      .distinct()
  }

  /** F3c: MinHash LSH pairs with distinct-signature collapse + df-capped
    * band buckets — the 100 TB twin of [[minhashLsh]] (VERDICT r5 #1).
    * Same (x, y) schema; output ⊆ minhashLsh (level-0 keys ARE the
    * uncapped band hashes, widening only refines — drop-only). Each doc
    * carries exactly one signature, so the cross/intra expansions emit
    * no duplicate pairs and need no distinct.
    */
  def minhashLshCapped(spark: SparkSession, docs: DataFrame, maxDf: Int): DataFrame =
    minhashCappedPairs(cachedSigTable(docs), maxDf).orderBy(col("x"), col("y"))

  /** The cached (doc_id, mh, sk) signature table — ONE plan shape, so
    * every consumer in a session (capped pairs, clusters, the F3e
    * estimate's slot joins) hits the same cache entry instead of
    * re-running the signature aggregation over the corpus.
    */
  private def cachedSigTable(docs: DataFrame): DataFrame =
    minhashSigRows(docs)
      .select(col("doc_id"), col("mh"), minhashSigKey.as("sk")).cachedOnce

  /** F3s: per-(band, widening-level) bucket statistics of the capped
    * keying — the df-cap guarantee turned into a VERIFIED artifact
    * instead of a docstring claim: for every band, how many distinct
    * signatures landed at each widening level, across how many
    * buckets, and the LARGEST bucket (which must be ≤ maxDf — the
    * hard bound the whole 100 TB candidate-join story rests on; an
    * operator change that silently broke the cap would flip this
    * query's rows before any wall-clock regression showed). Shares
    * the session-cached signature table and the keyed build with the
    * F3c family; one extra bounded aggregate.
    */
  def minhashBucketStats(spark: SparkSession, docs: DataFrame,
                         maxDf: Int): DataFrame = {
    val sig = cachedSigTable(docs)
    val keyed = cappedMinhashKeys(sig.select("sk", "mh").distinct(), maxDf)
    keyed.groupBy(col("band"), col("lvl"), col("bkey"))
      .agg(count(lit(1)).as("df"))
      .groupBy(col("band"), col("lvl"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("df")).as("n_sigs"),
        max(col("df")).as("max_df"))
      .select(col("band").cast("long").as("band"), col("lvl"),
        col("n_buckets"), col("n_sigs"), col("max_df"))
      .orderBy(col("band"), col("lvl"))
  }

  /** Capped candidate pairs from a prebuilt signature table (the
    * [[minhashLshCapped]] body, shared with [[minhashJaccardEst]]).
    */
  private def minhashCappedPairs(sig: DataFrame, maxDf: Int): DataFrame = {
    val sigPairs = cappedMinhashSigPairs(sig.select("sk", "mh").distinct(), maxDf)
    val crossPairs = sigPairs
      .join(sig.as("m1"), col("s1") === col("m1.sk"))
      .join(sig.as("m2"), col("s2") === col("m2.sk"))
      .select(least(col("m1.doc_id"), col("m2.doc_id")).as("x"),
        greatest(col("m1.doc_id"), col("m2.doc_id")).as("y"))
    val intra = sig.as("m1")
      .join(sig.as("m2"),
        col("m1.sk") === col("m2.sk") && col("m1.doc_id") < col("m2.doc_id"))
      .select(col("m1.doc_id").as("x"), col("m2.doc_id").as("y"))
    crossPairs.unionByName(intra)
  }

  /** F3e: per-pair Jaccard ESTIMATE from signature slot agreement —
    * the MinHash deliverable beyond candidate generation: the fraction
    * of the 12 signature slots on which x and y agree estimates
    * J(x, y) (each slot matches with probability exactly J). Pairs
    * come from the CAPPED candidate graph ([[minhashLshCapped]]), so
    * the estimate stage adds two hash equi-joins on doc_id against the
    * O(n) signature table — no new pairwise work at any scale. At
    * 100 TB this is the cheap re-score that ranks/thresholds
    * candidates without ever touching shingle sets again; estimates
    * land on the k/12 grid, so round(,4) is boundary-safe in both
    * engines.
    */
  def minhashJaccardEst(spark: SparkSession, docs: DataFrame, maxDf: Int): DataFrame = {
    val k = minhashParams.size
    // the SAME cached table feeds the pair pipeline and both slot
    // joins — the signature aggregation runs once per session, not
    // three times per query
    val sig = cachedSigTable(docs)
    val matches = (0 until k).map(i =>
      when(element_at(col("mx"), i + 1) === element_at(col("my"), i + 1), 1L)
        .otherwise(0L)).reduce(_ + _)
    minhashCappedPairs(sig, maxDf)
      .join(sig.select(col("doc_id").as("x"), col("mh").as("mx")), "x")
      .join(sig.select(col("doc_id").as("y"), col("mh").as("my")), "y")
      .select(col("x"), col("y"),
        round(matches.cast("double") / k, 4).as("est_jaccard"))
      .orderBy(col("x"), col("y"))
  }

  /** F3k: O(n)-output keep/drop decisions over the CAPPED MinHash
    * candidate graph (re-pointed off the uncapped band join, VERDICT r5
    * #1) — star clustering at signature-group level, the
    * [[simhashClusters]] shape: each sig group's rep is its min doc_id;
    * a group whose rep has a smaller neighbouring rep points at the
    * smallest such rep (one-step min propagation — chains deliberately
    * NOT transitively merged; the oracle replays the same rule). Docs
    * with no signature (< 3 tokens) are their own singleton cluster.
    * Output: (doc_id, cluster_id, keep) for every doc.
    */
  def minhashClusters(spark: SparkSession, docs: DataFrame, maxDf: Int): DataFrame = {
    val sig = cachedSigTable(docs)
    val sigPairs = cappedMinhashSigPairs(sig.select("sk", "mh").distinct(), maxDf)
    // groups: referenced by the rep joins and the final assignment
    val groups = sig.groupBy(col("sk")).agg(min(col("doc_id")).as("rep")).cachedOnce
    val oriented = sigPairs
      .join(groups.as("g1"), col("s1") === col("g1.sk"))
      .join(groups.as("g2"), col("s2") === col("g2.sk"))
      .select(
        when(col("g1.rep") < col("g2.rep"), col("s2")).otherwise(col("s1")).as("sk"),
        least(col("g1.rep"), col("g2.rep")).as("cand"))
    val roots = oriented.groupBy(col("sk")).agg(min(col("cand")).as("root"))
    val clusters = groups.join(roots, Seq("sk"), "left")
      .select(col("sk"), coalesce(col("root"), col("rep")).as("cluster_id"))
    // LEFT joins: a short doc has no signature row — it must surface as
    // its own singleton cluster, not vanish from the output
    docs.select(col("doc_id"))
      .join(sig.select(col("doc_id"), col("sk")), Seq("doc_id"), "left")
      .join(clusters, Seq("sk"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Shared O(n)-output clustering over an (x, y) candidate pair graph:
    * cluster_id = min({id} ∪ neighbours), one-step min propagation
    * (chains deliberately NOT transitively merged — deterministic
    * single pass, the rule every oracle replays). `ids` supplies the
    * full population so isolated members keep themselves. One shuffle:
    * the symmetric edge list groups by id with a map-side-combined min.
    */
  private[graft] def clusterize(ids: DataFrame, pairs: DataFrame,
                                idCol: String = "doc_id"): DataFrame = {
    val minNbr = pairs.select(col("x").as(idCol), col("y").as("nbr"))
      .unionByName(pairs.select(col("y").as(idCol), col("x").as("nbr")))
      .groupBy(col(idCol)).agg(min(col("nbr")).as("mn"))
    ids.select(col(idCol))
      .join(minNbr, Seq(idCol), "left")
      .select(col(idCol),
        least(col(idCol), coalesce(col("mn"), col(idCol))).as("cluster_id"))
      .withColumn("keep",
        when(col(idCol) === col("cluster_id"), 1L).otherwise(0L))
      .orderBy(col(idCol))
  }

  /** F36: INCREMENTAL ingest dedup — the production shape for "dedupe
    * the new crawl against the corpus": the BASE side is scanned (one
    * signature pass) but NEVER paired against itself; every candidate
    * pair has an incoming signature on its left, so pair work is
    * bounded by |incoming| × the df cap regardless of how large the
    * base has grown. A nightly re-dedup of a 100 TB corpus to admit a
    * 100 GB crawl is exactly the O(n²-ish) job this replaces.
    *
    * Verdict per incoming doc, in precedence order:
    *  - `exact_dup`  — its full 12-slot signature already exists in
    *    the base, or an earlier (smaller doc_id) incoming doc carries
    *    the same signature;
    *  - `near_dup`   — its signature shares a capped band bucket with
    *    a PRIOR signature: one present in the base, or one whose
    *    earliest incoming doc is smaller than this signature's own
    *    (the arrival-order rule that makes the verdict deterministic
    *    and independent of partitioning);
    *  - `unique`     — otherwise; docs too short to sign (< 3 tokens)
    *    are unique by the F3k singleton rule.
    *
    * Machinery is the F3c family verbatim: one shared signature table
    * over base ∪ incoming, distinct-signature collapse, df-capped
    * slot-widened band keys — the only new piece is the left-side
    * restriction of the band join to incoming-bearing signatures.
    */
  def minhashIncremental(spark: SparkSession, base: DataFrame,
                         incoming: DataFrame, maxDf: Int): DataFrame = {
    val all = base.select(col("doc_id"), col("text"))
      .unionByName(incoming.select(col("doc_id"), col("text")))
    val sig = cachedSigTable(all)
    val flags = sig.select(col("doc_id"), col("sk"))
      .join(base.select(col("doc_id"), lit(1L).as("is_base")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("sk"),
        coalesce(col("is_base"), lit(0L)).as("is_base"))
    // per-signature incremental state: does the base own it, and which
    // incoming doc reached it first
    val ski = flags.groupBy(col("sk"))
      .agg(max(col("is_base")).as("has_base"),
        min(when(col("is_base") === 0, col("doc_id"))).as("min_inc"))
      .cachedOnce
    val keyed = cappedMinhashKeys(
      sig.select("sk", "mh").distinct(), maxDf).cachedOnce
    // the left side carries ONLY incoming-bearing signatures — base
    // sigs meet the join solely as right-side bucket members, so
    // base×base pairs are never generated
    val keyedInc = keyed.join(
      ski.filter(col("min_inc").isNotNull).select(col("sk")), Seq("sk"))
    val cand = keyedInc.as("a")
      .join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.lvl") === col("b.lvl") &&
          col("a.bkey") === col("b.bkey") && col("a.sk") =!= col("b.sk"))
      .select(col("a.sk").as("ska"), col("b.sk").as("skb"))
      .distinct()
    val nearSk = cand
      .join(ski.select(col("sk").as("ska"), col("min_inc").as("me_min")), "ska")
      .join(ski.select(col("sk").as("skb"), col("has_base").as("o_base"),
        col("min_inc").as("o_min")), "skb")
      .filter(col("o_base") === 1 ||
        (col("o_min").isNotNull && col("o_min") < col("me_min")))
      .select(col("ska").as("sk"), lit(1L).as("near")).distinct()
    incoming.select(col("doc_id"))
      .join(flags.filter(col("is_base") === 0)
        .select(col("doc_id"), col("sk")), Seq("doc_id"), "left")
      .join(ski, Seq("sk"), "left")
      .join(nearSk, Seq("sk"), "left")
      .select(col("doc_id"),
        when(col("sk").isNull, "unique")
          .when(col("has_base") === 1 || col("min_inc") < col("doc_id"), "exact_dup")
          .when(col("near").isNotNull, "near_dup")
          .otherwise("unique").as("verdict"))
      .withColumn("keep", when(col("verdict") === "unique", 1L).otherwise(0L))
      .orderBy(col("doc_id"))
  }

  /** The standing corpus's dedup index — the STATIC side of the G14
    * stream-static gate, built once per base refresh (the artifact a
    * production ingest service holds): the base's distinct signature
    * keys (`sks`: one sk per distinct signature) and its df-capped
    * band buckets (`keys`: (sk, band, lvl, bkey)).
    */
  def incrementalIndex(spark: SparkSession, base: DataFrame,
                       maxDf: Int): (DataFrame, DataFrame) = {
    val sig = cachedSigTable(base)
    val dsig = sig.select("sk", "mh").distinct().cachedOnce
    (dsig, cappedMinhashKeys(dsig, maxDf).cachedOnce)
  }

  /** The distinct (sk, mh) signature table of a document set — the
    * portable currency of the incremental family (index sigs, F37
    * merge batches). `distinct()` over BOTH columns, not
    * dropDuplicates("sk"): sk is the md5 of all 12 slots, so it
    * determines mh, and a no-buffer hash-aggregate distinct replaces
    * the first(array) SortAggregate dropDuplicates plans (r12 — the
    * same equivalence every `select("sk", "mh").distinct()` in this
    * file rests on).
    */
  def distinctSigs(docs: DataFrame): DataFrame =
    cachedSigTable(docs).select(col("sk"), col("mh")).distinct()

  /** F37: standing-index REFRESH — fold a new batch's signatures into
    * the capped-key index WITHOUT a full rebuild, closing the
    * F36/G14 production loop (build once, gate all day, fold the
    * survivors in at night; consecutive days compose). Correctness
    * rests on a closure property of the widening schedule: level-j
    * slot lists CONTAIN the level-0 list, so any level-j collision
    * implies a level-0 collision — the level-0 bucket partition is
    * closed under adding signatures, and only level-0 buckets that
    * actually RECEIVE a new signature can see any df change at any
    * level. The merge therefore re-keys exactly the touched buckets'
    * member (sig, band) pairs — new members AND the old members a
    * newly-overflowing bucket forces to a wider level — and keeps
    * every other index row verbatim: merge(index(A), B) ≡
    * index(A ∪ B) EXACTLY (the driver oracle states this cross-engine
    * — the Spark side merges, DuckDB rebuilds from scratch, outputs
    * must hash-match). Work: one map-only level-0 scan of the merged
    * signature table + the full keying pipeline restricted to the
    * touched cohort; nothing pairwise, nothing proportional to
    * untouched-index size beyond the linear scan.
    *
    * Inputs: the standing index as (sigs = (sk, mh) distinct,
    * keyed = (sk, band, lvl, bkey)) — [[incrementalIndex]]'s shape —
    * and the new batch's (sk, mh) rows (need not be pre-deduped).
    * Returns the refreshed (sigs, keyed) pair.
    */
  def indexMerge(spark: SparkSession, baseSigs: DataFrame,
                 baseKeyed: DataFrame, newSigs: DataFrame,
                 maxDf: Int): (DataFrame, DataFrame) = {
    require(maxDf >= 1, s"maxDf must be >= 1 (got $maxDf)")
    val n = minhashWidenLevels
    val fresh = newSigs.select(col("sk"), col("mh")).distinct()
      .join(baseSigs.select(col("sk")), Seq("sk"), "left_anti")
      .cachedOnce
    val mergedSigs = baseSigs.select(col("sk"), col("mh"))
      .unionByName(fresh).cachedOnce
    def k0Structs = array((0 until minhashNBands).map(b =>
      struct(lit(b).as("band"), minhashKeyCol(b, 0).as("key0"))): _*)
    // touched level-0 buckets: the fresh signatures' per-band keys
    val touched = fresh.select(explode(k0Structs).as("t"))
      .select(col("t.band").as("band"), col("t.key0").as("key0"))
      .distinct()
    // cohort = every merged (sig, band) living in a touched bucket —
    // by the closure property, the complete set of index rows whose
    // level choice can change
    val cohort = mergedSigs
      .select(col("sk"), col("mh"), explode(k0Structs).as("t"))
      .select(col("sk"), col("mh"), col("t.band").as("band"),
        col("t.key0").as("key0"))
      .join(broadcast(touched), Seq("band", "key0"), "left_semi")
      .select(col("sk"), col("mh"), col("band"))
      .cachedOnce
    // re-run the standard keying pipeline restricted to the cohort:
    // within a touched bucket the cohort holds ALL members, so cohort
    // dfs equal global dfs at every level. Keys are built for ONLY the
    // row's own band via a CaseWhen over the 4 band values (r12:
    // CaseWhen evaluates just the matched arm, so each cohort row pays
    // 10 md5 keys instead of materializing all 40 (band, j, key)
    // structs and filtering 3/4 of them away post-explode — the md5
    // keying is this stage's dominant CPU).
    val perBand = (0 until minhashNBands).map { b =>
      array((0 to n).map(j =>
        struct(lit(j).as("j"), minhashKeyCol(b, j).as("key"))): _*)
    }
    val bandKeys = (1 until minhashNBands).foldLeft(
      when(col("band") === 0, perBand(0))) { (acc, b) =>
      acc.when(col("band") === b, perBand(b))
    }
    val exploded = cohort
      .select(col("sk"), col("mh"), col("band"), explode(bandKeys).as("jk"))
      .select(col("sk"), col("mh"), col("band"), col("jk.j").as("j"),
        col("jk.key").as("key"))
    val dfs = exploded.groupBy(col("band"), col("j"), col("key"))
      .agg(count(lit(1)).as("df"))
    // min LEVEL (long, hash-aggregable) + key recomputation from mh —
    // the [[cappedMinhashKeys]] shape (min(struct) forces SortAggregate)
    val cohortKeyed = exploded.join(dfs, Seq("band", "j", "key"))
      .groupBy(col("sk"), col("mh"), col("band"))
      .agg(min(when(col("df") <= maxDf, col("j"))).as("lvl0"))
      .select(col("sk"), col("band"), col("lvl0").cast("long").as("lvl"),
        minhashKeyAt(col("band"), col("lvl0")).as("bkey"))
    val mergedKeyed = baseKeyed
      .join(cohort.select(col("sk"), col("band")).distinct(),
        Seq("sk", "band"), "left_anti")
      .unionByName(cohortKeyed)
    (mergedSigs, mergedKeyed)
  }

  /** G14: in-flight incremental gate — each arriving document is
    * checked against the STANDING corpus's signature index AT INGEST:
    * `exact_dup` if its full signature exists in the base, `near_dup`
    * if any of its band keys (computed at EVERY widening level — the
    * base index stores each bucket at the one level its df fit, so
    * the arriving side offers all 40 (band, lvl, key) candidates and
    * the join picks the stored one), `unique` otherwise. This is the
    * base-only prior rule: incoming-vs-incoming dups are the nightly
    * F36 batch job's business; the gate's job is stopping re-crawls
    * of what the corpus already holds before they land. Stream-safe
    * shape: a map-only signature/key projection on the stream side +
    * two stream-static left joins against the (refreshable) index —
    * no state store, no stream-side aggregation.
    */
  def incrementalGateRows(docs: DataFrame, baseSks: DataFrame,
                          baseKeys: DataFrame): DataFrame = {
    val sig = minhashSigRows(docs)
      .select(col("doc_id"), col("mh"), minhashSigKey.as("sk"))
    val exact = sig.join(baseSks.select(col("sk"), lit(1L).as("ex")),
      Seq("sk"), "left")
    // the arriving doc's 40 candidate keys; a hit at ANY level of any
    // band is a collision with a stored base bucket
    val n = minhashWidenLevels
    val bjk = for (b <- 0 until minhashNBands; j <- 0 to n) yield
      struct(lit(b).as("band"), lit(j.toLong).as("lvl"),
        minhashKeyCol(b, j).as("bkey"))
    val nearHits = sig
      .select(col("doc_id"), explode(array(bjk: _*)).as("k"))
      .select(col("doc_id"), col("k.band").as("band"),
        col("k.lvl").as("lvl"), col("k.bkey").as("bkey"))
      .join(baseKeys.select(col("band"), col("lvl"), col("bkey"),
        col("sk").as("bsk")), Seq("band", "lvl", "bkey"))
      .select(col("doc_id")).distinct()
      .withColumn("nr", lit(1L))
    docs.select(col("doc_id"))
      .join(exact.select(col("doc_id"), col("ex")), Seq("doc_id"), "left")
      .join(nearHits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex").isNotNull, "exact_dup")
          .when(col("nr").isNotNull, "near_dup")
          .otherwise("unique").as("verdict"))
      .withColumn("keep", when(col("verdict") === "unique", 1L).otherwise(0L))
  }

  /** F2k: O(n)-output keep/drop over the df-capped shingle-Jaccard
    * candidate graph (the scale-path pair source), same one-step rule.
    */
  def jaccardClusters(docs: DataFrame, tau: Double, maxDf: Int): DataFrame =
    clusterize(docs.select(col("doc_id")),
      ngramJaccardCapped(docs, tau, maxDf).select(col("x"), col("y")))

  /** F19: TRUE connected components over an (x, y) pair graph —
    * iterated min-label propagation to fixpoint (VERDICT r5 #2). The
    * one-step [[clusterize]] rule under-canonicalizes chains (A–B, B–C
    * labels C as B); production dedup REPORTING — cluster sizes,
    * representative selection — wants every member labeled with its
    * component's min id, which is what the fixpoint delivers.
    *
    * Scale shape: the symmetric edge list gains a self-loop per id and
    * is hash-partitioned on the neighbour column ONCE, outside the
    * loop. Each iteration joins the current labels against it (the
    * label side arrives already partitioned on the join key from the
    * previous iteration's aggregation, so the join re-shuffles nothing
    * after iteration 1) and reduces with ONE map-side-combined min
    * groupBy; the self-loop row carries each id's previous label
    * through the same aggregate, so convergence detection costs no
    * second join. Each round's labels are cached and the previous
    * round's cache dropped (cache, not checkpoint: InMemoryRelation
    * PRESERVES the aggregation's hash partitioning, which is what lets
    * the next join skip its exchange — a checkpoint scan reports
    * unknown partitioning and re-shuffles every round; at 20-iteration
    * depth the lineage stays cheap, and a production run on flaky
    * executors would add a reliable `checkpoint` every few rounds).
    * Convergence needs at most diameter(G) iterations — near-dup
    * components are shallow by construction — and the bounded-iteration
    * guard throws rather than silently returning an under-merged
    * labeling.
    */
  /** One [[ccClusters]] propagation round: (u, lbl, prev) where lbl =
    * min over {own label} ∪ {neighbour labels} and prev is the previous
    * label (carried by the v = u self-loop row through the SAME
    * aggregate — convergence detection without a second join). With
    * `labels` partitioned on u (every round after the first — the
    * aggregation output, preserved by the round cache) and `edges`
    * pre-partitioned on v, the join re-shuffles nothing and the round's
    * only exchange is this groupBy.
    */
  private[graft] def ccStep(labels: DataFrame, edges: DataFrame): DataFrame =
    edges
      .join(labels.select(col("u").as("v"), col("lbl").as("vlbl")), "v")
      .groupBy(col("u"))
      .agg(min(col("vlbl")).as("lbl"),
        min(when(col("v") === col("u"), col("vlbl"))).as("prev"))

  def ccClusters(ids: DataFrame, pairs: DataFrame, maxIter: Int = 20,
                 idCol: String = "doc_id"): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1 (got $maxIter)")
    // symmetric edges + self-loops, partitioned by the neighbour key and
    // cached: the loop re-reads this every iteration
    val edges = pairs.select(col("x").as("u"), col("y").as("v"))
      .unionByName(pairs.select(col("y").as("u"), col("x").as("v")))
      .unionByName(ids.select(col(idCol).as("u"), col(idCol).as("v")))
      .repartition(col("v")).cachedOnce
    var labels = ids.select(col(idCol).as("u"), col(idCol).as("lbl"))
    var prevCache: Option[DataFrame] = None
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val next = ccStep(labels, edges).cachedOnce
      changed = next.filter(col("lbl") < col("prev")).count() // materializes
      prevCache.foreach(_.unpersist())
      prevCache = Some(next)
      labels = next.select(col("u"), col("lbl"))
      it += 1
    }
    require(changed == 0,
      s"connected components did not converge within $maxIter iterations " +
        s"($changed labels still changing) — raise maxIter")
    edges.unpersist()
    labels
      .select(col("u").as(idCol), col("lbl").as("cluster_id"))
      .withColumn("keep",
        when(col(idCol) === col("cluster_id"), 1L).otherwise(0L))
      .orderBy(col(idCol))
  }

  /** F19b: duplicate-cluster size report over canonical component
    * labels — the numbers a dedup run is actually judged by ("how many
    * dup groups, how big, what do we delete"): one row per
    * multi-member component with its size and the doc count removed
    * under keep-the-representative. Needs the FIXPOINT labels
    * ([[ccClusters]]) — under one-step propagation a chain's members
    * split across labels and every size is wrong.
    *
    * Scale shape: one map-side-combinable count over the label column;
    * singleton components (the overwhelming mass of any real corpus)
    * are filtered AFTER the count but the output is O(dup groups), not
    * O(corpus) — the report ships to a driver/dashboard.
    */
  def ccSizes(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("size"))
      .filter(col("size") >= 2)
      .select(col("cluster_id"), col("size"),
        (col("size") - 1L).as("n_removed"))
      .orderBy(col("size").desc, col("cluster_id"))

  /** F45: SOFT dedup — duplicate DOWN-WEIGHTING instead of removal
    * (keep-one-per-cluster discards the copies' context diversity;
    * weighting each member 1/|cluster| keeps every copy while the
    * cluster's total sampling mass equals one document's — the soft
    * alternative recent data-mixture work prefers, and the number a
    * mixture sampler consumes directly as a rate multiplier). Input is
    * the F19 fixpoint label table; output one row per doc:
    * (doc_id, cluster_id, size, weight), weight = 1/size on the 4-dp
    * grid — singletons weigh exactly 1.0, so Σweight over the corpus
    * is the effective post-dedup document count.
    *
    * Scale shape: one map-side-combinable count keyed by cluster_id,
    * then a join back on the SAME key (the aggregation's partitioning
    * is reused — no second wide shuffle of the label table); output is
    * O(corpus), pairwise work stays wherever the label build paid it.
    */
  def softDedupWeights(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("size"))
    labels.select(col("doc_id"), col("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("size"),
        round(lit(1.0) / col("size") - 1e-9, 4).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** F13k: O(n)-output keep/drop over the embedding-cosine pair graph.
    * Takes the pair source as an argument so the exact graph (oracle)
    * and the LSH-bucketed graph (100 TB path) share the rule.
    */
  def embedCosineClusters(vecs: DataFrame, pairs: DataFrame): DataFrame =
    clusterize(vecs.select(col("vec_id")),
      pairs.select(col("x"), col("y")), idCol = "vec_id")

  /** F13: embedding-cosine near-duplicate pairs, exact semantics — all
    * (x < y) with cosine ≥ τ. This is the correctness baseline (the
    * pair join is inherently quadratic); `embedCosineLshPairs` is the
    * 100 TB path. Cosine arithmetic is the codegen'd FloatDot
    * (float→double products, array-order sum) matching the DuckDB
    * oracle's DOUBLE[] list_dot_product.
    */
  def embedCosinePairs(vecs: DataFrame, tau: Double): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.FloatDot.dot(a, b)
    val n = vecs.select(col("vec_id"), col("embedding").as("e"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        round(col("cos") - 1e-9, 4).as("cos"))
      .orderBy(col("x"), col("y"))
  }

  /** F13-scale: cosine near-dup with candidates from shared
    * random-hyperplane buckets (any of `nTables` tables, same planes as
    * Ann.lshTopK), then the exact cosine filter. The pair join is a
    * (table, bucket) equi-join — shuffle keyed by bucket, never an
    * all-pairs cross join. Approximation only drops pairs (candidates
    * are a subset); never adds false positives past the cosine filter.
    */
  def embedCosineLshPairs(vecs: DataFrame, tau: Double, nPlanes: Int,
                          dim: Int, nTables: Int = 4): DataFrame = {
    import graft.similarity.Ann
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.FloatDot.dot(a, b)
    val pls = Ann.planes(nPlanes, dim)
    // candidate join carries ONLY ids — the bucket self-join can fan out
    // to many candidate rows, and shuffling 16-byte id pairs instead of
    // two embedding payloads is what keeps it cheap; embeddings re-join
    // AFTER the (x,y) dedup, from a per-doc (so broadcastable) side
    val b = vecs.select(col("vec_id"),
      posexplode(Ann.tableBuckets(col("embedding"), pls, nTables)).as(Seq("t", "b")))
    val cand = b.as("a").join(b.as("b"),
        col("a.t") === col("b.t") && col("a.b") === col("b.b") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"))
      .dropDuplicates("x", "y")
    val n = vecs.select(col("vec_id"), col("embedding").as("e"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    cand
      .join(n.as("na"), col("x") === col("na.vec_id"))
      .join(n.as("nb"), col("y") === col("nb.vec_id"))
      .withColumn("cos", dot(col("na.e"), col("nb.e")) / (col("na.nrm") * col("nb.nrm")))
      .filter(col("cos") >= tau)
      .select(col("x"), col("y"), round(col("cos") - 1e-9, 4).as("cos"))
      .orderBy(col("x"), col("y"))
  }

  /** F28: semantic dedup, the cluster-then-prune shape of SemDeDup
    * (Abbas et al. 2023): coarse-quantize every embedding to its
    * nearest of K centroids (`Ann.coarseAssign` — the IVF routing
    * rule), consider near-duplicate pairs ONLY within a cluster (the
    * candidate join is a cent_id equi-join — each cluster is one
    * shuffle bucket, never an all-pairs join), exact-cosine filter at
    * τ, then the shared one-step [[clusterize]] keep/drop. Cross-
    * cluster pairs are missed BY DESIGN — that is the approximation
    * SemDeDup trades for scale (candidates are a strict subset of the
    * exact F13 graph at the same τ; no false positives past the
    * cosine filter).
    *
    * 100 TB posture: K scales with the corpus (the paper holds
    * CLUSTER SIZE fixed, not K), so per-cluster pair work stays
    * bounded; the candidate join shuffles 16-byte id pairs, embeddings
    * re-join after (the embedCosineLshPairs discipline); exact-dup
    * mass — the one thing that could still make a hot cluster
    * quadratic — is removed UPSTREAM by F1 in pipeline order (SemDeDup
    * runs after exact dedup; `Curation` stages document the same
    * ordering). Output: (vec_id, cent_id, cluster_id, keep).
    *
    * The CODEBOOK is a parameter (VERDICT r6 #4): the paper's pipeline
    * k-means-clusters first, so the driver entry passes the F6c
    * Lloyd-refined codebook (`Ann.refinedCentroids`) — tighter cells ⇒
    * fewer cross-cell misses at the same K; any K-row (cent_id, ce, cn)
    * frame works, and the plan shape (one broadcast scoring pass, one
    * cent_id equi-join) is codebook-independent.
    */
  def semanticClusters(vecs: DataFrame, tau: Double, codebook: DataFrame): DataFrame = {
    import graft.similarity.Ann
    semanticClustersAssigned(vecs, tau, Ann.coarseAssign(vecs, codebook))
  }

  /** [[semanticClusters]] over a caller-supplied (vec_id, cent_id)
    * coarse partition — the seam that lets the K∝corpus regime swap in
    * the O(√K) two-level router (`Ann.coarseAssignTwoLevel`) without
    * touching the prune: any assignment with one cell per vector
    * yields the same candidate-bounding and subset-of-exact
    * properties (cells just partition differently).
    */
  private[graft] def semanticClustersAssigned(vecs: DataFrame, tau: Double,
                                              assignment: DataFrame): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.FloatDot.dot(a, b)
    // the (vec_id, cent_id) assignment feeds three consumers (both
    // sides of the cell self-join + the output projection) — cache the
    // 16-byte/row table once instead of re-running the corpus×codebook
    // scoring per reference (the cached-MinHash-signature discipline;
    // at 100 TB this narrow table is what you'd checkpoint)
    val assigned = assignment.select(col("vec_id"), col("cent_id")).cachedOnce
    val cand = assigned.as("ja").join(assigned.as("jb"),
        col("ja.cent_id") === col("jb.cent_id") && col("ja.vec_id") < col("jb.vec_id"))
      .select(col("ja.vec_id").as("x"), col("jb.vec_id").as("y"))
    val n = vecs.select(col("vec_id"), col("embedding").as("e"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val pairs = cand
      .join(n.as("na"), col("x") === col("na.vec_id"))
      .join(n.as("nb"), col("y") === col("nb.vec_id"))
      .filter(dot(col("na.e"), col("nb.e")) / (col("na.nrm") * col("nb.nrm")) >= tau)
      .select(col("x"), col("y"))
      // clusterize symmetrizes the edge list (two projections of this
      // plan) — cache the 16-byte/row pair table, not the cosine work
      .cachedOnce
    clusterize(vecs.select(col("vec_id")), pairs, idCol = "vec_id")
      .join(assigned, Seq("vec_id"))
      .select(col("vec_id"), col("cent_id"), col("cluster_id"), col("keep"))
      .orderBy(col("vec_id"))
  }

  /** F4: 60-bit SimHash (md5-derived token hashes keep the DuckDB
    * oracle bit-identical). The signature is ONE compiled per-row pass
    * (graft.functions.SimHash60) over the distinct-token array — no
    * explode, no groupBy, no shuffle at all; signatures stream out of
    * the scan stage. (Earlier shape: explode + 60 bit-sum aggregates in
    * one groupBy — correct but one full shuffle of the token rows.)
    */
  def simhash(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHash60.simhash(array_distinct(tokens(col("text"))))
        .as("simhash"))

  /** Widening schedule for the df-capped simhash variants: a band's
    * 15-bit key can be extended in 5-bit chunks drawn from the OTHER
    * three bands' bits (9 chunks → level 9 = all 60 bits, a bijection
    * of the full simhash). Shared by the Spark plan and the DuckDB
    * oracle (SparkEntry renders the same arithmetic as SQL).
    */
  val simhashWidenLevels = 9

  /** SQL expression for the level-`j` widened band key (15 + 5j bits).
    * Engine-portable arithmetic: only `>>`, `&`, `|`, `%` on BIGINT.
    */
  def simhashKeyExpr(j: Int): String = {
    val base = "(simhash >> cast(band*15 AS int)) & 32767"
    val exts = (0 until j).map { c =>
      s"((((simhash >> cast(((band + 1 + ${c / 3}) % 4)*15 AS int)) >> ${(c % 3) * 5}) & 31) << ${15 + c * 5})"
    }
    (base +: exts).mkString("(", " | ", ")")
  }

  /** The level-`lvl` widened key recomputed from the row's `simhash`
    * and `band` columns — the simhash twin of [[minhashKeyAt]], for the
    * same reason: aggregating min(LEVEL) hash-aggregates where
    * min(struct(j, key)) forces a SortAggregate. Keys are nested
    * prefixes in BIT space (extension chunk c occupies bits
    * 15+5c..19+5c, so k_j = k_9 & (2^(15+5j)−1)): one level-9 key and
    * one dynamic mask, pure integer arithmetic, no CaseWhen.
    */
  private def simhashKeyAt(lvlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr(simhashKeyExpr(simhashWidenLevels))
      .bitwiseAND(call_function("shiftleft", lit(1L),
        (lvlCol * 5 + lit(15)).cast("int")) - 1)

  /** Per-(sig, band) bucket keys with progressive df-capped widening
    * (VERDICT r2 #1). A band bucket holding more than `maxDf` DISTINCT
    * signatures is re-keyed with 5 more simhash bits, repeatedly, until
    * it fits; level 9 keys carry all 60 bits, and the input rows are
    * distinct signatures, so every bucket ends at df ≤ max(maxDf, 1) —
    * the per-bucket self-join work is bounded by maxDf²/2 pairs
    * REGARDLESS of corpus size (at sf0.1 the max bucket drops 1,582 →
    * maxDf). Keys are nested prefixes, so two sigs sharing a level-k key
    * share every coarser key and therefore agree on the level itself:
    * joining on (band, lvl, key) loses exactly the pairs whose only
    * shared bands were hot AND whose extension bits differ — the same
    * documented drop-only approximation as ngramJaccardCapped.
    */
  private[graft] def cappedBandKeys(spark: SparkSession, sigs: DataFrame, maxDf: Int): DataFrame = {
    // maxDf=0 would make the min(when(df <= maxDf, ...)) aggregate null
    // for EVERY bucket (df ≥ 1 always), silently dropping all candidates
    // instead of falling back to the level-9 key — reject it loudly
    require(maxDf >= 1, s"maxDf must be >= 1 (got $maxDf)")
    val n = simhashWidenLevels
    val bandIdx = broadcast(spark.range(4).toDF("band"))
    // one (band, level, key) row per sig per level — 10 narrow rows per
    // band row. ONE count shuffle + ONE join + ONE min-struct groupBy
    // replaces a per-level window cascade (10 sequential exchanges):
    // same shuffled bytes, 3 stages instead of 10 (profiled 5.0 s →
    // sub-second on the 20k-row sf0.1 keyed table; at 10B sigs the win
    // is stage-barrier count, volume stays linear).
    val exploded = sigs.crossJoin(bandIdx)
      .select(col("simhash"), col("band"),
        posexplode(array((0 to n).map(j => expr(simhashKeyExpr(j))): _*))
          .as(Seq("j", "key")))
    val dfs = exploded.groupBy(col("band"), col("j"), col("key"))
      .agg(count(lit(1)).as("df"))
    // bucket refinement is monotone (k_j = mask(k_{j+1}), so df never
    // grows with j) and level n is a per-band bijection of the full
    // simhash (df = 1 over DISTINCT sigs), so min(when(df ≤ cap, j))
    // IS "the first level that fits" and always exists; the chosen
    // level's key is recomputed from (simhash, band) ([[simhashKeyAt]])
    exploded.join(dfs, Seq("band", "j", "key"))
      .groupBy(col("simhash"), col("band"))
      .agg(min(when(col("df") <= maxDf, col("j"))).as("lvl0"))
      .select(col("simhash"), col("band"), col("lvl0").cast("long").as("lvl"),
        simhashKeyAt(col("lvl0")).as("bkey"))
  }

  /** Candidate signature pairs (s1 < s2, hamming ≤ maxHamming) from the
    * df-capped band join over DISTINCT simhash values. Collapsing to
    * distinct sigs first is what makes dup-heavy corpora safe: an
    * N-doc exact-duplicate group is ONE row in this join.
    */
  private[graft] def cappedSigPairs(spark: SparkSession, sigs: DataFrame,
                                    maxHamming: Int, maxDf: Int): DataFrame = {
    // cached: the self-join consumes keyed twice — uncached, the whole
    // explode/count/join keying pipeline executes once per join side
    val keyed = cappedBandKeys(spark, sigs, maxDf).cachedOnce
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.lvl") === col("b.lvl") &&
          col("a.bkey") === col("b.bkey") && col("a.simhash") < col("b.simhash"))
      .select(col("a.simhash").as("s1"), col("b.simhash").as("s2"))
      .distinct()
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
  }

  /** F4-scale pairs: simhashPairs with df-capped band buckets. Same
    * (x, y, hamming) schema; output ⊆ simhashPairs (drop-only). Exact
    * within a widened bucket; equals simhashPairs when no bucket is hot.
    * Identical-sig doc pairs (hamming 0) are emitted from a group
    * expansion, never through the band join. Measured on the synthetic
    * corpus at maxDf=64: pair recall 0.85 at sf0.01; doc-level dup
    * coverage (a doc with ≥1 exact-F4 pair still has ≥1 capped pair —
    * the keep/drop signal) 1.00 at sf0.01 / 0.987 at sf0.1. Bucket
    * evidence (DuckDB, same keying): sf0.1 max bucket 1,582 raw → 64
    * capped; candidate sig-pairs 2.94M → 133k. NOTE the all-pairs
    * OUTPUT itself is Ω(n²) on dup-heavy corpora; the O(n) production
    * shape is `simhashClusters`.
    */
  def simhashPairsCapped(spark: SparkSession, docs: DataFrame,
                         maxHamming: Int, maxDf: Int): DataFrame =
    cappedPairsFromSigs(spark, simhash(spark, docs), "doc_id", maxHamming, maxDf)

  /** Id-level (x, y, hamming) pairs from any (id, simhash) 60-bit
    * signature map via the df-capped band join — the expansion stage of
    * [[simhashPairsCapped]], factored out so non-text signature sources
    * (image perceptual hashes, ImageDedup) reuse the identical
    * machinery. Identical-sig pairs come from the intra-group
    * expansion, never through the band join.
    */
  private[graft] def cappedPairsFromSigs(spark: SparkSession, sigMap: DataFrame,
                                         idCol: String, maxHamming: Int,
                                         maxDf: Int): DataFrame = {
    // two pair-expansion joins reference the id→sig map
    val sim = sigMap.cachedOnce
    val sigPairs = cappedSigPairs(spark, sim.select("simhash").distinct(), maxHamming, maxDf)
    val crossPairs = sigPairs
      .join(sim.as("m1"), col("s1") === col("m1.simhash"))
      .join(sim.as("m2"), col("s2") === col("m2.simhash"))
      .select(least(col(s"m1.$idCol"), col(s"m2.$idCol")).as("x"),
        greatest(col(s"m1.$idCol"), col(s"m2.$idCol")).as("y"), col("hamming"))
    val intra = sim.as("m1")
      .join(sim.as("m2"),
        col("m1.simhash") === col("m2.simhash") && col(s"m1.$idCol") < col(s"m2.$idCol"))
      .select(col(s"m1.$idCol").as("x"), col(s"m2.$idCol").as("y"), lit(0L).as("hamming"))
    crossPairs.unionByName(intra).orderBy(col("x"), col("y"))
  }

  /** F34: hamming-space top-k SEARCH over 60-bit signatures — ranked
    * nearest-neighbour lookup against a STANDING signature index, the
    * search twin of [[cappedPairsFromSigs]]: "which corpus items does
    * this new item near-duplicate", ordered by distance, without ever
    * pairing the base against itself (the [[minhashIncremental]]
    * base-is-never-self-joined discipline, in hamming space).
    *
    * Candidate generation is the G14 all-level probe: the base index
    * ([[cappedBandKeys]] over the base's DISTINCT signatures) stores
    * each (sig, band) bucket at the ONE widening level its df fit, so
    * the query side offers its key at EVERY level (40 narrow rows per
    * distinct query signature — map-only) and the (band, lvl, key)
    * equi-join picks out exactly the stored bucket. An identical
    * signature collides at every level including the stored one; a
    * near-duplicate at hamming ≤ 3 has an untouched band (4-band
    * pigeonhole) and is found unless that band was df-widened past the
    * differing bits — the same drop-only approximation as every capped
    * family.
    *
    * Ranking: per query, row_number over (hamming asc, match_id asc) —
    * deterministic; rows past `k` or past `maxHamming` are cut.
    *
    * Scale shape: the base is scanned once into the (cachedOnce,
    * refreshable via [[indexMerge]]'s simhash twin) index; candidate
    * volume is bounded by 40·|query sigs|·maxDf REGARDLESS of base
    * size; the rank window partitions by q_id — high cardinality, no
    * hot partition; id expansion joins carry 8-byte sigs, never
    * payloads. Output (q_id, match_id, hamming, rank).
    */
  def hammingSearch(spark: SparkSession, baseSigs: DataFrame,
                    querySigs: DataFrame, k: Int, maxHamming: Int,
                    maxDf: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    // (match_id, simhash): consumed by the distinct-sig index build and
    // the id expansion join
    val base = baseSigs.select(col("match_id"), col("simhash")).cachedOnce
    val keyed = cappedBandKeys(spark, base.select("simhash").distinct(), maxDf)
    val qsig = querySigs.select(col("q_id"), col("simhash")).cachedOnce
    val candSigs = hammingProbeKeys(spark, qsig.select(col("simhash")))
      .join(keyed, Seq("band", "lvl", "bkey"))
      .select(col("qs"), col("simhash").as("bs"))
      .distinct()
      .withColumn("hamming", bit_count(col("qs").bitwiseXOR(col("bs"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("hamming"), col("match_id"))
    candSigs
      .join(qsig.select(col("q_id"), col("simhash").as("qs")), "qs")
      .join(base.select(col("match_id"), col("simhash").as("bs")), "bs")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("match_id"), col("hamming"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Every (band, level) key for each distinct signature — the G14
    * all-level probe offering against a [[cappedBandKeys]] index,
    * shared by [[hammingSearch]] and [[hammingGateRows]]. Map-only:
    * 40 narrow rows per distinct signature, no shuffle until the
    * probe join itself.
    */
  private def hammingProbeKeys(spark: SparkSession, sigs: DataFrame): DataFrame = {
    val n = simhashWidenLevels
    val bandIdx = broadcast(spark.range(4).toDF("band"))
    sigs.select(col("simhash")).distinct()
      .crossJoin(bandIdx)
      .select(col("simhash"), col("band"),
        posexplode(array((0 to n).map(j => expr(simhashKeyExpr(j))): _*))
          .as(Seq("j", "key")))
      .select(col("simhash").as("qs"), col("band"),
        col("j").cast("long").as("lvl"), col("key").as("bkey"))
  }

  /** The standing hamming-space index over a base signature set — the
    * [[incrementalIndex]] shape for the 60-bit families: (distinct
    * signature values, df-capped band buckets), both cachedOnce — the
    * refreshable artifact an ingest gate holds between micro-batches.
    */
  def hammingIndex(spark: SparkSession, baseSigs: DataFrame,
                   maxDf: Int): (DataFrame, DataFrame) = {
    val sv = baseSigs.select(col("simhash")).distinct().cachedOnce
    (sv, cappedBandKeys(spark, sv, maxDf).cachedOnce)
  }

  /** F41: standing HAMMING-index refresh — [[indexMerge]]'s theorem in
    * 60-bit signature space, closing the F34/G15 loop the way F37
    * closed F36/G14: fold a batch's signatures into the capped-key
    * index WITHOUT a full rebuild. The closure property holds
    * verbatim: a level-j key is the level-0 band value OR-extended
    * with higher bits ([[simhashKeyExpr]]), so any level-j collision
    * implies a level-0 collision — only level-0 buckets that RECEIVE
    * a new signature can see any df change at any level, and a level-j
    * bucket lies entirely inside one level-0 bucket, so the cohort
    * (every merged signature in a touched level-0 bucket) sees
    * cohort-local dfs equal to global dfs at every level. The merge
    * re-keys exactly the cohort's (sig, band) rows — new members AND
    * standing members a newly-overflowing bucket forces wider — and
    * keeps every other index row verbatim: merge(index(A), B) ≡
    * index(A ∪ B) EXACTLY (the driver oracle states this cross-engine:
    * Spark merges, DuckDB rebuilds from scratch).
    *
    * Inputs are [[hammingIndex]]'s shape — (distinct simhash values,
    * (simhash, band, lvl, bkey)) — plus the batch's signature values
    * (need not be pre-deduped). Returns the refreshed pair.
    */
  def hammingIndexMerge(spark: SparkSession, baseSigVals: DataFrame,
                        baseKeyed: DataFrame, newSigVals: DataFrame,
                        maxDf: Int): (DataFrame, DataFrame) = {
    require(maxDf >= 1, s"maxDf must be >= 1 (got $maxDf)")
    val n = simhashWidenLevels
    val bandIdx = broadcast(spark.range(4).toDF("band"))
    val fresh = newSigVals.select(col("simhash")).distinct()
      .join(baseSigVals.select(col("simhash")), Seq("simhash"), "left_anti")
      .cachedOnce
    val mergedSigs = baseSigVals.select(col("simhash"))
      .unionByName(fresh).cachedOnce
    def k0(df: DataFrame) = df.crossJoin(bandIdx)
      .select(col("simhash"), col("band"), expr(simhashKeyExpr(0)).as("key0"))
    // touched level-0 buckets: the fresh signatures' per-band values
    val touched = k0(fresh).select(col("band"), col("key0")).distinct()
    val cohort = k0(mergedSigs)
      .join(broadcast(touched), Seq("band", "key0"), "left_semi")
      .select(col("simhash"), col("band"))
      .cachedOnce
    // the standard keying pipeline restricted to the cohort
    val exploded = cohort
      .select(col("simhash"), col("band"),
        posexplode(array((0 to n).map(j => expr(simhashKeyExpr(j))): _*))
          .as(Seq("j", "key")))
    val dfs = exploded.groupBy(col("band"), col("j"), col("key"))
      .agg(count(lit(1)).as("df"))
    // min LEVEL (long, hash-aggregable) + key recomputation — the
    // [[cappedBandKeys]] shape (min(struct) forces SortAggregate)
    val cohortKeyed = exploded.join(dfs, Seq("band", "j", "key"))
      .groupBy(col("simhash"), col("band"))
      .agg(min(when(col("df") <= maxDf, col("j"))).as("lvl0"))
      .select(col("simhash"), col("band"), col("lvl0").cast("long").as("lvl"),
        simhashKeyAt(col("lvl0")).as("bkey"))
    val mergedKeyed = baseKeyed
      .join(cohort, Seq("simhash", "band"), "left_anti")
      .unionByName(cohortKeyed)
    (mergedSigs, mergedKeyed)
  }

  /** G15 core: in-flight hamming-space gate — each arriving signature
    * checked against the STANDING index: `exact_dup` if the 60-bit
    * signature itself exists in the base, `near_dup` if a DIFFERENT
    * base signature sits within `maxHamming` (candidates via the
    * all-level probe — the stored bucket is found at whatever level
    * its df fit), `unique` otherwise. Base-only priors (the G14
    * discipline): arriving-vs-arriving duplicates are the nightly
    * batch job's business. Stream-safe: map-only signature/probe
    * projection + two stream-static joins against the refreshable
    * index — no state store, no stream-side aggregation.
    */
  def hammingGateRows(spark: SparkSession, querySigs: DataFrame,
                      baseSigVals: DataFrame, baseKeyed: DataFrame,
                      maxHamming: Int): DataFrame = {
    val q = querySigs.select(col("q_id"), col("simhash"))
    val exact = baseSigVals.select(col("simhash")).distinct()
      .withColumn("ex", lit(1L))
    val nearSigs = hammingProbeKeys(spark, q.select(col("simhash")))
      .join(baseKeyed, Seq("band", "lvl", "bkey"))
      .select(col("qs"), col("simhash").as("bs"))
      .distinct()
      .filter(col("qs") =!= col("bs") &&
        bit_count(col("qs").bitwiseXOR(col("bs"))).cast("long") <= maxHamming)
      .select(col("qs").as("simhash")).distinct()
      .withColumn("nr", lit(1L))
    q.join(exact, Seq("simhash"), "left")
      .join(nearSigs, Seq("simhash"), "left")
      .select(col("q_id"),
        when(col("ex").isNotNull, "exact_dup")
          .when(col("nr").isNotNull, "near_dup")
          .otherwise("unique").as("verdict"))
      .withColumn("keep", when(col("verdict") === "unique", 1L).otherwise(0L))
  }

  /** F4-scale clusters: O(n)-output keep/drop decisions instead of
    * Ω(n²) pairs (VERDICT r2 #1b). Star clustering, single pass: each
    * signature group's representative is its min doc_id; a group whose
    * rep has a smaller hamming-≤-max neighbour rep points at the
    * smallest such rep (one-step min propagation — chains are NOT
    * transitively merged; deterministic, and the oracle applies the
    * same rule). Output: (doc_id, cluster_id, keep) for every doc,
    * keep = 1 iff doc_id == cluster_id.
    */
  def simhashClusters(spark: SparkSession, docs: DataFrame,
                      maxHamming: Int, maxDf: Int): DataFrame = {
    val sim = simhash(spark, docs).cachedOnce
    // groups: referenced by the rep join and the final assignment
    val groups = sim.groupBy(col("simhash")).agg(min(col("doc_id")).as("rep")).cachedOnce
    val sigPairs = cappedSigPairs(spark, groups.select("simhash"), maxHamming, maxDf)
    // orient each sig pair by rep order; the larger rep's group gets a
    // root candidate — min over candidates is the cluster id
    val oriented = sigPairs
      .join(groups.as("g1"), col("s1") === col("g1.simhash"))
      .join(groups.as("g2"), col("s2") === col("g2.simhash"))
      .select(
        when(col("g1.rep") < col("g2.rep"), col("s2")).otherwise(col("s1")).as("simhash"),
        least(col("g1.rep"), col("g2.rep")).as("cand"))
    val roots = oriented.groupBy(col("simhash")).agg(min(col("cand")).as("root"))
    val clusters = groups.join(roots, Seq("simhash"), "left")
      .select(col("simhash"), coalesce(col("root"), col("rep")).as("cluster_id"))
    // LEFT join + coalesce: a null-text doc has a null signature, which
    // an inner join would silently DROP from the output — it becomes
    // its own singleton cluster instead (the contract is one row per
    // doc; null sigs carry no similarity evidence)
    sim.join(clusters, Seq("simhash"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  def simhashPairs(spark: SparkSession, docs: DataFrame, maxHamming: Int): DataFrame = {
    import spark.implicits._
    // cache per-doc band rows (4/doc): without it the self-join evaluates
    // the 60-bit-sum aggregation twice (broadcast side can't reuse the
    // shuffle side's exchange)
    val sim = simhash(spark, docs)
    val bandIdx = broadcast(spark.range(4).toDF("band"))
    val bands = sim.crossJoin(bandIdx)
      .select(col("doc_id"), col("simhash"), col("band"),
        expr("(simhash >> cast(band*15 AS int)) & 32767").as("bv"))
      .cachedOnce
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("x"), col("y"))
  }

  // ---- F52: content-defined chunking dedup --------------------------

  /** Expected chunk length in tokens: a boundary falls AFTER token p
    * when h60(token_p) % CdcW == 0, so ~1/W of tokens end a chunk.
    */
  val CdcW = 16

  /** F52: content-defined chunking (CDC) dedup — the STORAGE-layer
    * dedup shape (rsync/LBFS/casync/restic): chunk boundaries derive
    * from CONTENT, not offsets, so an insertion near the start of a
    * document shifts every byte offset but re-synchronizes at the
    * next content boundary — only the edited chunk's hash changes,
    * and the shared tail still dedups against the original (the spec
    * pins exactly this property; fixed-size blocks lose it, which is
    * the whole reason CDC exists). Tokens stand in for bytes (the
    * repo's corpus unit); the boundary rule h60(token) % W == 0 is
    * the rolling-hash cut rule with a token-level window.
    *
    * Chunking is fully IN-ROW (filter/transform over the token array
    * — map-only, stays in whole-stage codegen); the only shuffle is
    * the per-chunk-hash window that computes occurrence counts and
    * elects the canonical copy (first by (doc_id, chunk_idx) — the
    * dedup store's "store once, reference elsewhere" rule). Per-chunk
    * state is O(distinct chunks); no pairwise work anywhere, so the
    * operator scales like F1 exact dedup regardless of corpus size.
    */
  def dedupCdc(spark: SparkSession, docs: DataFrame, w: Int = CdcW): DataFrame = {
    require(w >= 1, s"chunk window must be >= 1 (got $w)")
    val toks = tokens(col("text"))
    // ONE `aggregate` fold over the token array (the EMA in-row-fold
    // seam): the accumulator carries (closed chunks, open buffer);
    // each token appends to the buffer and a boundary token
    // (h60 % w == 0) closes it; the finisher closes a non-empty tail.
    // This touches every token and every h60 EXACTLY ONCE — the
    // original positions/starts/ends formulation re-evaluated those
    // whole arrays inside the per-chunk lambda (lambda bodies can't
    // share outer subexpressions), which profiled ~13× slower at
    // sf0.1 (48 s → 3.6 s). Semantics are IDENTICAL, including the
    // never-an-empty-chunk rule: a boundary on the last token closes
    // the final chunk exactly where the finisher would, so no empty
    // chunk can exist (the oracle is unchanged, as it must be).
    val emptyChunks = array().cast("array<struct<n_tokens:bigint,chunk_text:string>>")
    val emptyBuf = array().cast("array<string>")
    def close(cs: org.apache.spark.sql.Column,
              buf: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(cs, array(struct(
        size(buf).cast("long").as("n_tokens"),
        array_join(buf, " ").as("chunk_text"))))
    val chunks = aggregate(
      toks,
      struct(emptyChunks.as("cs"), emptyBuf.as("buf")),
      (acc, tok) => {
        val buf2 = concat(acc.getField("buf"), array(tok))
        when(h60(tok) % w === 0,
          struct(close(acc.getField("cs"), buf2).as("cs"),
            emptyBuf.as("buf")))
          .otherwise(struct(acc.getField("cs").as("cs"), buf2.as("buf")))
      },
      acc => when(size(acc.getField("buf")) > 0,
        close(acc.getField("cs"), acc.getField("buf")))
        .otherwise(acc.getField("cs")))
    val ct = docs.select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.n_tokens").cast("long").as("n_tokens"),
        md5(col("c.chunk_text")).as("chunk_md5"))
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy(col("chunk_md5"))
    val wOrd = w0.orderBy(col("doc_id"), col("chunk_idx"))
    ct.withColumn("df", count(lit(1)).over(w0))
      .withColumn("keep", (row_number().over(wOrd) === 1).cast("boolean"))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("chunk_md5"), col("df"), col("keep"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  // ---- F59: byte-level CDC dedup ------------------------------------

  /** Expected chunk length 2^maskBits bytes (gear-hash high-bit mask,
    * [[graft.functions.CdcChunks]]); 6 → 64-byte chunks, the LBFS-ish
    * granularity that keeps a 4 KB payload ~64 chunks.
    */
  val CdcBytesMaskBits = 6

  /** Chunk-hash document-frequency cap: a chunk shared by more than
    * this many payloads is boilerplate (a zero run, a format header)
    * and is excluded from PAIR generation — the same df-cap discipline
    * as every band join in this file; candidate volume stays
    * ∝ payloads · cap, never quadratic in a hot chunk's df.
    */
  val CdcBytesMaxDf = 64

  /** Planted byte-payload fixture (the ImageDedup planted-twin
    * discipline): every doc_id % 3 == 0 document carries a 4 KB
    * pseudo-random payload (an md5 keystream seeded by doc_id — no
    * two originals share a single chunk), and every % 5 == 0 of those
    * additionally plants an INSERT variant under id + 4e7: k =
    * (id % 13) + 1 bytes spliced in at offset (id % 50) + 1. The
    * variant shifts every downstream byte offset, which is exactly
    * what byte-CDC must see through — so the expected near-dup pairs
    * are pure id arithmetic and the oracle never hashes a byte.
    */
  val CdcBytesVariantOffset = 40000000L
  val CdcBytesPayloadLen = 4096

  /** Deterministic pseudo-random payload: len bytes of
    * md5("cdc-pay-<id>-<block>") keystream — executor-side, never on
    * the driver.
    */
  private[graft] def cdcPayload(id: Long, len: Int): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](len)
    var block = 0
    var p = 0
    while (p < len) {
      d.reset()
      val dig = d.digest(s"cdc-pay-$id-$block".getBytes("UTF-8"))
      val n = math.min(16, len - p)
      System.arraycopy(dig, 0, out, p, n)
      p += n
      block += 1
    }
    out
  }

  private[graft] def cdcInsertVariant(id: Long, base: Array[Byte]): Array[Byte] = {
    val k = (id % 13).toInt + 1
    val at = (id % 50).toInt + 1
    val d = java.security.MessageDigest.getInstance("MD5")
    val ins = d.digest(s"cdc-ins-$id".getBytes("UTF-8")).take(k)
    val out = new Array[Byte](base.length + k)
    System.arraycopy(base, 0, out, 0, at)
    System.arraycopy(ins, 0, out, at, k)
    System.arraycopy(base, at, out, at + k, base.length - at)
    out
  }

  /** (media_id, payload) rows for the planted fixture over `docs`. */
  def cdcBytePayloads(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
      .as[Long]
      .flatMap { id =>
        val base = cdcPayload(id, CdcBytesPayloadLen)
        val orig = Seq((id, base))
        if (id % 5 == 0)
          orig :+ (id + CdcBytesVariantOffset, cdcInsertVariant(id, base))
        else orig
      }
      .toDF("media_id", "payload")
  }

  /** Incoming fixture for the G25 ingest gate: every %15==0 doc sends
    * its INSERT VARIANT (id + 4e7 — a near-dup of a stored payload,
    * must be refused) and a NOVEL payload (id + 8e7, a fresh md5
    * keystream sharing no 64-byte chunk with any stored one — must be
    * admitted); expected verdicts are pure id arithmetic.
    */
  val CdcBytesNovelOffset = 80000000L

  def cdcByteIncoming(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.filter(col("doc_id") % 15 === 0).select(col("doc_id"))
      .as[Long]
      .flatMap { id =>
        val base = cdcPayload(id, CdcBytesPayloadLen)
        Seq(
          (id + CdcBytesVariantOffset, cdcInsertVariant(id, base)),
          (id + CdcBytesNovelOffset,
            cdcPayload(id + CdcBytesNovelOffset, CdcBytesPayloadLen)))
      }
      .toDF("media_id", "payload")
  }

  /** The standing CHUNK STORE's key set: distinct (chunk_md5, len)
    * over the stored payloads — the refreshable artifact the G25
    * ingest gate probes (the G14/G15 index discipline: rebuilt by the
    * batch sweep, frozen between sweeps). ≤ bytes/2^maskBits rows —
    * the dedup index a content-addressed store maintains anyway.
    */
  def cdcChunkIndex(payloads: DataFrame,
                    maskBits: Int = CdcBytesMaskBits): DataFrame =
    payloads.select(
        explode(graft.functions.CdcChunks.cdcChunks(col("payload"), maskBits)).as("c"))
      .select(col("c.chunk_md5").as("chunk_md5"), col("c.length").as("len"))
      .distinct()

  /** G25 batch form: per-payload ingest verdict against the frozen
    * chunk index — each incoming payload chunks map-only (the
    * compiled kernel riding the scan), every chunk OCCURRENCE probes
    * the index (a store holding a chunk once dedups all its repeats,
    * so occurrences count — no distinct on the probe side), and the
    * verdict is the shared-byte fraction of the payload:
    * frac ≥ tau → drop (keep = 0). The probe is a plain equi-join on
    * (chunk_md5, len) with the strategy LEFT TO CATALYST/AQE
    * deliberately: at benchmark scale the index fits a broadcast; at
    * store scale the index is ~bytes/2^maskBits rows (terabytes of
    * md5s for a 100 TB store — never broadcastable), and the right
    * plan is a shuffle-hash join against the (bucketed) store index
    * with the bounded incoming side as the build side — forcing
    * broadcast() here would pin the toy-scale plan. Only the
    * per-payload fraction aggregates — work ∝ incoming chunks plus
    * the index partitions their keys touch, never the whole store.
    */
  def cdcGateRows(incoming: DataFrame, index: DataFrame,
                  maskBits: Int = CdcBytesMaskBits,
                  tau: Double = 0.5): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"cdcGateRows: tau must be in (0,1] (got $tau)")
    val ch = incoming.select(col("media_id"),
        explode(graft.functions.CdcChunks.cdcChunks(col("payload"), maskBits)).as("c"))
      .select(col("media_id"), col("c.chunk_md5").as("chunk_md5"),
        col("c.length").as("len"))
    ch.join(index.withColumn("hit", lit(1L)),
        Seq("chunk_md5", "len"), "left")
      .groupBy(col("media_id"))
      .agg(sum(col("len")).as("total"),
        sum(when(col("hit") === 1L, col("len")).otherwise(0L)).as("shared"))
      .select(col("media_id"),
        when(col("shared").cast("double") >= lit(tau) * col("total").cast("double"),
          0L).otherwise(1L).as("keep"))
  }

  /** F59: byte-level CDC near-dup pairs — the storage-layer dedup F52
    * runs on token arrays, at its REAL granularity: payload bytes.
    * Each payload is chunked by the compiled gear-hash kernel in one
    * pass ([[graft.functions.CdcChunks]] — the F52 lesson applied:
    * never per-chunk lambdas), chunks join on (chunk_md5, length)
    * under the df cap, and a pair is emitted when the shared bytes
    * reach `minFrac` of the LARGER payload. Within-payload repeated
    * chunks contribute min(count_x, count_y) matches (multiset
    * semantics — a zero-run repeated 5× in x and 2× in y shares 2
    * chunks, not 10 join rows double-counted).
    *
    * Scale shape: chunking is map-only compiled work riding the scan;
    * the only shuffles are the (media_id, chunk_md5) combine and the
    * chunk_md5-keyed equi-join whose per-key fan-out the df cap
    * bounds — pair work ∝ chunks · cap, never payloads², the F3
    * discipline. Chunk rows carry (id, md5, length) only — payload
    * bytes never shuffle.
    */
  def dedupCdcBytes(spark: SparkSession, payloads: DataFrame,
                    maskBits: Int = CdcBytesMaskBits,
                    maxDf: Int = CdcBytesMaxDf,
                    minFrac: Double = 0.5): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0,
      s"minFrac must be in (0,1] (got $minFrac)")
    val ch = payloads.select(col("media_id"),
        explode(graft.functions.CdcChunks.cdcChunks(col("payload"), maskBits)).as("c"))
      .select(col("media_id"), col("c.chunk_md5").as("chunk_md5"),
        col("c.length").as("len"))
      .groupBy(col("media_id"), col("chunk_md5"), col("len"))
      .agg(count(lit(1)).as("cnt"))
      .cachedOnce
    val totals = ch.groupBy(col("media_id"))
      .agg(sum(col("len") * col("cnt")).as("total"))
    // df cap over DISTINCT payloads carrying the chunk (boilerplate gate)
    val rare = ch.groupBy(col("chunk_md5"), col("len"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("chunk_md5"), col("len"))
    val keyed = ch.join(rare, Seq("chunk_md5", "len"))
    val shared = keyed.select(col("chunk_md5"), col("len"),
        col("media_id").as("x"), col("cnt").as("nx"))
      .join(keyed.select(col("chunk_md5"), col("len"),
        col("media_id").as("y"), col("cnt").as("ny")),
        Seq("chunk_md5", "len"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(sum(least(col("nx"), col("ny")) * col("len")).as("shared_bytes"))
    shared
      .join(totals.select(col("media_id").as("x"), col("total").as("tx")), Seq("x"))
      .join(totals.select(col("media_id").as("y"), col("total").as("ty")), Seq("y"))
      .filter(col("shared_bytes").cast("double") >=
        lit(minFrac) * greatest(col("tx"), col("ty")).cast("double"))
      .select(col("x"), col("y"))
      .orderBy(col("x"), col("y"))
  }
}
