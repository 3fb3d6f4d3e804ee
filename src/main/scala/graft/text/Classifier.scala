package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Caching._
import TextFns._

/** F42: fastText-style linear quality classifier over hashed unigram
  * features — the filter stage the big web-corpus pipelines put in
  * front of everything else (CCNet / GPT-3-style "looks like the
  * reference corpus" scoring): hash each token into one of [[Dim]]
  * buckets, represent a document as the L1-normalized bucket-count
  * vector, and train a logistic model with full-batch gradient
  * descent, then score the corpus map-only with the frozen weights.
  *
  * Engine-portability is designed in rather than hoped for:
  *
  *  - the link function is the *fast sigmoid* σ(z) = 0.5 + z/(2(1+|z|))
  *    — only +, ·, /, abs, all correctly-rounded IEEE ops, so Spark,
  *    the JVM driver loop, and the DuckDB oracle produce bit-identical
  *    probabilities (a transcendental exp() would be library-dependent
  *    in the last ulp, and GD FEEDS each iteration's output into the
  *    next — 1-ulp drift compounds);
  *  - every cross-row sum rides a fixed-point BIGINT grid (1e-12 for
  *    the per-token z terms, 1e-9 for gradient terms), so aggregation
  *    order cannot change the result — the same discipline as the F23
  *    LM mean and the PQ ADC grid;
  *  - the per-doc linear term is an IN-ROW `aggregate` fold over the
  *    token array with the weights as a 64-slot literal array
  *    (codegen'd, no explode, no shuffle), so scoring — and the z-pass
  *    of every GD iteration — is map-only; only the gradient reduction
  *    shuffles, and it shuffles ≤ [[Dim]]+1 keys after map-side
  *    partial aggregation.
  *
  * Scale shape: one cached pass builds (doc_id, toks, n, y); each GD
  * iteration is one scan of that cache (z fold + explode) into a
  * [[Dim]]+1-row aggregate collected to the driver — the model is the
  * bounded artifact, like the ANN codebooks. T iterations = T scans;
  * at 100 TB one trains on an F24 hash-sample instead (the same
  * sample-then-freeze path as F21s BPE), which [[train]] supports by
  * taking any docs DataFrame.
  *
  * Reference has no counterpart (DataYours is a time-series engine);
  * the operator follows the published fastText / CCNet quality-filter
  * shape (Joulin et al. 2016; Wenzek et al. 2020).
  */
object Classifier {

  /** Feature-hash buckets (w fits a literal array slot per bucket). */
  val Dim = 64
  /** Full-batch GD iterations. */
  val Iters = 3
  /** Learning rate (exact binary fraction — renders as "0.5" in SQL). */
  val Eta = 0.5
  /** Weak-label rule for the driver query: F8 4-dp quality score ≥
    * this ⇒ positive (204/500 positive at sf0.01 — balanced enough to
    * give the gradient both directions).
    */
  val LabelMin = 0.42

  /** Frozen model artifact: [[Dim]] bucket weights + bias. */
  final case class Model(w: Array[Double], bias: Double)

  /** Token → feature bucket (md5-derived, same arithmetic as the
    * DuckDB oracle's ('0x'||substr(md5(tok),1,15))::BIGINT % Dim).
    */
  private def bucket(tok: Column): Column = h60(tok) % Dim

  /** Per-doc linear term z = bias + Σ_tokens ⌊(w[b]/n)·1e12⌉ / 1e12 —
    * the compiled [[graft.functions.ClassifierZ]] kernel (one codegen
    * pass per document; the declarative `aggregate` HOF fold it
    * replaces is interpreted — lambda bodies never enter whole-stage
    * codegen, the F8b lesson — and profiled at ~3× the kernel on the
    * G16 path, §6). `n` must be the token-array length (the kernel
    * derives it internally; the parameter documents the contract).
    * Arithmetic is bit-identical (same h60 bucket, same
    * HALF_UP-on-shortest-repr rounding), spec-pinned kernel ≡ fold.
    */
  private def zCol(toks: Column, n: Column, m: Model): Column =
    lit(m.bias) +
      graft.functions.ClassifierZ.zFixed(toks, m.w).cast("double") / lit(1e12)

  /** The declarative HOF form of the fold, kept as the kernel's
    * cross-check twin (ClassifierSpec pins kernel ≡ fold on real and
    * planted docs).
    */
  private[graft] def zColDeclarative(toks: Column, n: Column, m: Model): Column = {
    val warr = array(m.w.toSeq.map(lit): _*)
    val zs = aggregate(toks, lit(0L), (acc, t) =>
      acc + round(element_at(warr, (bucket(t)).cast("int") + 1) / n * lit(1e12))
        .cast("long"))
    lit(m.bias) + zs.cast("double") / lit(1e12)
  }

  /** Fast sigmoid — the shared link (see object doc for why not exp). */
  private def sigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Training base: tokenized docs with the caller's label column
    * (cast to 0.0/1.0). Null-text docs carry no signal and are
    * excluded symmetrically in the oracle.
    */
  private def baseOf(docs: DataFrame, label: Column): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"),
        size(tokens(col("text"))).cast("long").as("n"),
        label.cast("double").as("y"))

  /** Full-batch GD: w ← w − η·(Σ_docs ⌊(err/n)·1e9⌉ per bucket)/(N·1e9),
    * bias likewise over ⌊err·1e9⌉ per doc; err = σ(z) − y. Each
    * iteration: one map-only z/err pass over the cached base, one
    * explode → ≤ Dim+1-key aggregate (bias rides as bucket −1),
    * collect, update on the driver with the SAME expression shape the
    * oracle renders (divide → scale by η → subtract).
    */
  def train(docs: DataFrame, label: Column,
            iters: Int = Iters, eta: Double = Eta): Model = {
    // hash each document ONCE: the cached base carries the Dim-slot
    // bucket-count vector (graft.functions.ClassifierBuckets — the same
    // h60-mod-Dim rule), and every iteration's z and gradient are
    // count-weighted folds over it. Exact by the fixed-point identity:
    // every occurrence of a bucket-b token contributes the SAME rounded
    // long, so Σ_occurrences ≡ counts[b]·⌊·⌉ term by term (spec-pinned
    // kernel ≡ per-token fold; r13, guide §1.2 per-task work — the
    // per-iteration md5 pass over every token was the family's
    // dominant CPU and grew linearly with the iteration count).
    val base = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.ClassifierBuckets.counts(tokens(col("text")), Dim)
          .as("bcnt"),
        size(tokens(col("text"))).cast("long").as("n"),
        label.cast("double").as("y"))
      .cachedOnce
    val nDocs = base.count()
    val nD = nDocs * 1e9
    val w = Array.fill(Dim)(0.0)
    var bias = 0.0
    for (_ <- 0 until iters) {
      val perDoc = base
        .withColumn("z", lit(bias) +
          graft.functions.ClassifierZ.zFixedCounts(col("bcnt"), w.clone())
            .cast("double") / lit(1e12))
        .withColumn("err", sigmoid(col("z")) - col("y"))
      val grads = perDoc
        .select(col("err"), col("n"), posexplode(col("bcnt")).as(Seq("b", "c")))
        .filter(col("c") > 0L)
        .select(col("b").cast("int").as("b"),
          (col("c") * round(col("err") / col("n") * lit(1e9)).cast("long"))
            .as("fx"))
        .unionAll(perDoc.select(lit(-1).as("b"),
          round(col("err") * lit(1e9)).cast("long").as("fx")))
        .groupBy(col("b")).agg(sum(col("fx")).as("s"))
        .collect()
      grads.foreach { r =>
        val b = r.getInt(0); val s = r.getLong(1)
        if (b == -1) bias = bias - eta * (s.toDouble / nD)
        else w(b) = w(b) - eta * (s.toDouble / nD)
      }
    }
    Model(w, bias)
  }

  /** The trained model as a driver-comparable DataFrame:
    * (bucket, weight) with bias at bucket −1, 6-dp grid.
    */
  def weightsDf(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    ((-1L, m.bias) +: m.w.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("bucket", "w")
      .select(col("bucket"), round(col("w") - lit(1e-9), 6).as("weight"))
      .orderBy(col("bucket"))
  }

  /** Label-free frozen-weight scoring projection: (doc_id, prob,
    * kept) — ONE map-only select (the in-row z fold with the model as
    * literals; no join, no shuffle, no state), so it serves per-event
    * streaming ingest (G16) and batch identically and the two cannot
    * drift. kept = 1 when σ(z) ≥ 0.5.
    */
  def scoreRows(docs: DataFrame, m: Model): DataFrame = {
    val p = sigmoid(col("z"))
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"),
        size(tokens(col("text"))).cast("long").as("n"))
      .withColumn("z", zCol(col("toks"), col("n"), m))
      .select(col("doc_id"), round(p - lit(1e-9), 4).as("prob"),
        when(p >= 0.5, 1L).otherwise(0L).as("kept"))
  }

  /** Map-only frozen-weight scoring: (doc_id, label, prob, pred).
    * The plan is a single projection over the scan — the in-row z fold
    * with the model as literals; no join, no shuffle (G16's streaming
    * twin shares this exact shape).
    */
  def score(docs: DataFrame, label: Column, m: Model): DataFrame = {
    val p = sigmoid(col("z"))
    baseOf(docs, label)
      .withColumn("z", zCol(col("toks"), col("n"), m))
      .select(col("doc_id"), col("y").cast("long").as("label"),
        round(p - lit(1e-9), 4).as("prob"),
        when(p >= 0.5, 1L).otherwise(0L).as("pred"))
      .orderBy(col("doc_id"))
  }
}
