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

  /** F39: EPOCH-SHUFFLED training order — the deterministic "shuffle"
    * a 100 TB training run actually performs: a true global random
    * permutation is a full sort nobody runs at scale; the production
    * shape is hash-bucketed reshuffling — each doc lands in bucket
    * h60(doc_id‖"#epoch"‖e) mod `nBuckets` (epoch-SALTED, so
    * consecutive epochs decorrelate without any state), readers
    * consume buckets in order, and WITHIN a bucket the read order is
    * the hash rank — deterministic, partition-count-independent, and
    * independent of input row order (the F24/F18 salted-hash
    * discipline applied to ordering instead of membership).
    *
    * Scale shape: one shuffle keyed by bucket; the rank window
    * partitions by bucket (each ~n/nBuckets rows — nBuckets is the
    * shard knob, sized so a bucket fits an executor); no global sort,
    * no driver collect. Output (doc_id, bucket, pos), pos 1-based
    * within bucket.
    */
  def epochOrder(docs: DataFrame, epoch: Int, nBuckets: Int,
                 idCol: String = "doc_id"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    val h = graft.text.TextFns.h60(
      concat(col(idCol).cast("string"), lit(s"#epoch$epoch")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("h"), col(idCol))
    docs.select(col(idCol), h.as("h"))
      .withColumn("bucket", pmod(col("h"), lit(nBuckets.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("bucket"), col("pos"))
      .orderBy(col("bucket"), col("pos"))
  }

  /** F29: exact global quality-quantile buckets — the curriculum /
    * mixing stage that needs each document's PERCENTILE of the F8
    * quality score, not the raw value (thresholds like "drop the worst
    * decile" are rank statements). A naive `ntile() OVER (ORDER BY
    * score)` is a single-task global sort at 100 TB; this is the F27
    * bucketed-prefix-sum shape instead, with the 4-dp score itself as
    * the bucket key: scores quantize to ≤10001 distinct fixed-point
    * values, so per-score counts are a BOUNDED table — the global rank
    * is a within-score row_number (partitioned window) plus a
    * strictly-smaller-score offset from a bounded triangular join, and
    * no stage ever funnels the corpus through one task.
    *
    * Hot-score skew (a 100 TB crawl has millions of score-0 docs) is
    * handled HERE, not deferred: within a score, docs order by
    * h60(doc_id), so the top `subBits` hash bits split every score
    * group into 2^subBits contiguous sub-ranges — no window partition
    * ever exceeds (hottest score)/2^subBits rows, and raising subBits
    * is the same knob as F27's bucketBits (plan shape unchanged).
    * Offsets compose two bounded stages: strictly-smaller-score totals
    * via the triangular join (≤10001 rows), plus earlier-sub-bucket
    * counts via a per-score window over ≤2^subBits rows.
    *
    * `bucket = ((rank − 1) · nBuckets) div n_docs` — pure integer
    * arithmetic on both engines, and exactly DuckDB's
    * `((row_number() − 1) * n) // count(*)` replay over the same
    * (score_fp, h, doc_id) order.
    */
  def qualityBuckets(docs: DataFrame, nBuckets: Int = 10, subBits: Int = 4): DataFrame = {
    require(nBuckets >= 2, s"need at least two buckets (got $nBuckets)")
    require(subBits >= 1 && subBits <= 20, s"subBits in [1,20] (got $subBits)")
    val scored = graft.text.Analysis.quality(docs)
      .select(col("doc_id"),
        round(col("score") * 10000, 0).cast("long").as("score_fp"))
      .withColumn("h", graft.text.TextFns.h60(col("doc_id").cast("string")))
      .withColumn("sub", shiftright(col("h"), 60 - subBits))
    val grp = scored.groupBy(col("score_fp"), col("sub")).agg(count(lit(1)).as("gn"))
    val scoreTot = grp.groupBy(col("score_fp")).agg(sum(col("gn")).as("stot"))
    val scoreOff = scoreTot.as("a")
      .join(scoreTot.select(col("score_fp").as("ps"), col("stot").as("pt")),
        col("ps") < col("a.score_fp"), "left")
      .groupBy(col("a.score_fp").as("score_fp"))
      .agg(coalesce(sum(col("pt")), lit(0L)).as("soff"))
    val wSub = org.apache.spark.sql.expressions.Window
      .partitionBy(col("score_fp")).orderBy(col("sub"))
    val offsets = grp
      .withColumn("boff", sum(col("gn")).over(wSub) - col("gn"))
      .join(scoreOff, "score_fp")
      .select(col("score_fp"), col("sub"), (col("soff") + col("boff")).as("off"))
    val total = scoreTot.agg(sum(col("stot")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("score_fp"), col("sub")).orderBy(col("h"), col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(offsets), Seq("score_fp", "sub"))
      .crossJoin(broadcast(total))
      .withColumn("rank", col("off") + col("rk"))
      .withColumn("bucket",
        expr(s"((rank - 1) * $nBuckets) div n_docs").cast("long"))
      .select(col("doc_id"), col("score_fp"), col("rank"), col("bucket"))
      .orderBy(col("doc_id"))
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
                      idCol: String = "doc_id"): DataFrame =
    sampleByStratumRows(docs, ratesBp, defaultBp, strataCol, idCol)
      .orderBy(col(idCol))

  /** The UNORDERED keep projection behind [[sampleByStratum]] — one
    * narrow map-only select, shared with the G13 streaming twin (a
    * stream cannot sort; the batch entry adds the deterministic
    * order on top).
    */
  def sampleByStratumRows(docs: DataFrame, ratesBp: Seq[(String, Int)],
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
  }

  /** F47: duplicate-aware WEIGHTED sampling — the F24 stratum sampler
    * with each document's keep rate scaled by its F45 soft-dedup
    * weight: eff_bp = rate_bp div size (PURE integer division, the
    * F21c engine-portability discipline), so a duplicate cluster's
    * expected post-sampling mass equals ONE document's at the stratum
    * rate — soft dedup applied AT THE SAMPLING STAGE instead of as a
    * separate corpus rewrite (one fewer full-corpus materialization in
    * the pipeline; the standard trick when the sampler is the next
    * stage anyway). `weights` is the F45 table (doc_id, size ...);
    * keep stays a pure function of (doc_id, lang, cluster size), so
    * the sample is repartition-stable like F24's.
    *
    * Scale shape: the F24 projection is map-only; the only addition is
    * one equi-join on doc_id against the weight table — at 100 TB both
    * sides are corpus-sized but the join is a co-partitionable id join
    * (and the weight table is the label build's output, already keyed
    * by doc).
    */
  def sampleWeighted(docs: DataFrame, weights: DataFrame,
                     ratesBp: Seq[(String, Int)], defaultBp: Int,
                     strataCol: String = "lang"): DataFrame =
    sampleByStratumRows(docs, ratesBp, defaultBp, strataCol)
      .drop("keep")
      .join(weights.select(col("doc_id"), col("size")), Seq("doc_id"))
      .withColumn("eff_bp", expr("rate_bp div size"))
      .select(col("doc_id"), col(strataCol), col("bucket"), col("rate_bp"),
        col("size"), col("eff_bp"),
        when(col("bucket") < col("eff_bp"), 1L).otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))

  /** F35: mixture PLANNING — the step before [[sampleByStratum]]: a
    * training run fixes a token BUDGET per stratum ("20M German, 5M
    * code, the rest English"), and the planner turns budgets into the
    * basis-point keep rates the sampler consumes: rate_bp =
    * min(10000, ⌊target·10000 / available⌋) — integer arithmetic
    * end-to-end (no float thresholds to diverge between engines), a
    * stratum with more budget than supply caps at keep-everything, an
    * unlisted stratum falls to `defaultTarget`. One map-side-combined
    * aggregate over the corpus (available token mass per stratum) and
    * a K-row projection; output carries the audit columns (available,
    * target, rate, expected kept tokens = available·rate/10000) a
    * human signs off on before the sampler runs.
    */
  /** F55: TEMPERATURE-scaled mixture plan — the multilingual
    * pretraining recipe (XLM-R / mBERT exponentiated sampling): draw
    * stratum i with probability ∝ p_i^α, α ∈ (0,1), so low-resource
    * strata are upweighted without discarding the head (α=1 is plain
    * proportional sampling — every stratum gets the SAME rate; α<1 is
    * the whole point). Given per-stratum doc counts c_i and a total
    * budget of T docs: q_i ∝ c_i^α, picks_i = T·q_i, rate_bp_i =
    * min(10000, 10000·picks_i div c_i).
    *
    * α is fixed at 1/2 so the power is `sqrt` — correctly rounded
    * IEEE in BOTH engines (pow(x, 0.5) carries no such guarantee) —
    * and each sqrt snaps to a 1e-6 fixed-point BIGINT BEFORE the
    * cross-stratum normalizer sum (the F23/F50 discipline: an integer
    * sum is accumulation-order-free where a float sum of K sqrts is
    * not), after which every derivation is integer div arithmetic.
    * Bounds: c ≤ 1e12 ⇒ sq_fp ≤ 1e12; T ≤ 1e6 keeps T·sq_fp < 2^63.
    * K-row output — the plan artifact the sampler freezes.
    */
  def mixPlanTemperature(docs: DataFrame, totalBudget: Long,
                         strataCol: String = "lang"): DataFrame = {
    require(totalBudget >= 0 && totalBudget <= 1000000L,
      s"totalBudget in [0, 1e6] (got $totalBudget; the fixed-point bound)")
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    val sq = counts.withColumn("sq_fp",
      round(sqrt(col("n_docs").cast("double")) * 1e6, 0).cast("long"))
    val tot = sq.agg(sum(col("sq_fp")).as("s_fp"))
    sq.crossJoin(broadcast(tot))
      .withColumn("picks", expr(s"${totalBudget}L * sq_fp div s_fp"))
      .withColumn("rate_bp",
        least(lit(10000L), expr("10000L * picks div n_docs")))
      .select(col(strataCol), col("n_docs"), col("sq_fp"),
        col("picks"), col("rate_bp"))
      .orderBy(col(strataCol))
  }

  /** F55 apply: the F24 sampler driven by a PLAN TABLE instead of a
    * literal rate list — the K-row plan broadcast-joins on the
    * stratum, then the same salted bucket and pure-integer keep as
    * [[sampleByStratum]] (a stratum absent from the plan drops, rate
    * 0). This is how a computed plan (F35's or F55's) feeds the
    * sampler WITHOUT a driver-side collect.
    */
  def sampleWithPlan(docs: DataFrame, plan: DataFrame,
                     strataCol: String = "lang",
                     idCol: String = "doc_id"): DataFrame = {
    val bucket = graft.text.TextFns
      .h60(concat(col(idCol).cast("string"), lit("#sample"))) % 10000L
    docs.select(col(idCol), col(strataCol), bucket.as("bucket"))
      .join(broadcast(plan.select(col(strataCol), col("rate_bp"))),
        Seq(strataCol), "left")
      .select(col(idCol), col(strataCol), col("bucket"),
        coalesce(col("rate_bp"), lit(0L)).as("rate_bp"),
        when(col("bucket") < coalesce(col("rate_bp"), lit(0L)), 1L)
          .otherwise(0L).as("keep"))
      .orderBy(col(idCol))
  }

  def mixPlan(docs: DataFrame, targets: Seq[(String, Long)],
              defaultTarget: Long, strataCol: String = "lang"): DataFrame = {
    require(targets.forall(_._2 >= 0) && defaultTarget >= 0,
      "token targets must be non-negative")
    val targetCol = targets.foldRight(lit(defaultTarget)) {
      case ((name, t), rest) => when(col(strataCol) === name, t).otherwise(rest)
    }
    docs
      .select(col(strataCol),
        size(graft.text.TextFns.tokens(col("text"))).cast("long").as("ntok"))
      .groupBy(col(strataCol))
      .agg(sum(col("ntok")).as("available"))
      .select(col(strataCol), col("available"), targetCol.as("target"),
        // floor-division via floor(double): Column `/` on longs widens
        // to double silently, so make the floor EXPLICIT; products
        // stay far under 2^53, where the double round trip is exact
        least(lit(10000L),
          floor((targetCol * 10000L).cast("double") / col("available"))
            .cast("long")).as("rate_bp"))
      .withColumn("expected",
        floor((col("available") * col("rate_bp")).cast("double") / 10000L)
          .cast("long"))
      .orderBy(col(strataCol))
  }

  // ---- F53: DSIR importance scoring ---------------------------------

  /** Hashed-feature space size for [[dsirScore]] — the DSIR paper's
    * hashed n-gram buckets (they use 10k over uni+bigrams; 512 over
    * unigrams matches this corpus's vocabulary scale).
    */
  val DsirBuckets = 512

  /** F53: Data Selection with Importance Resampling (Xie et al. 2023)
    * — the published recipe for "select raw pretraining data that
    * LOOKS LIKE a trusted target corpus": fit smoothed bag-of-
    * hashed-ngrams unigram distributions over a TARGET slice (p) and
    * the RAW corpus (q), score every document by its importance
    * log-weight Σ_tokens (ln p_b − ln q_b), and keep documents the
    * target distribution favors. The per-BUCKET log-ratio is computed
    * once in the B-row feature table and snapped to a 1e-6
    * fixed-point BIGINT, so each document's sum is integer-exact and
    * accumulation-order-free (the F23/F50 discipline) — the keep gate
    * compares an exact integer against 0 (weight > 1 ⇔ the doc is
    * likelier under the target). Budgeted selection (the paper's
    * resample-to-k) composes with F29's exact-rank machinery over the
    * logw column; the gate form here is the streaming-friendly shape.
    *
    * Scale: ONE corpus tokenize shuffle (map-side-combined bucket
    * counts + the per-doc sum reuse the same exploded stream, cached
    * narrow); the B-row delta table is a broadcast; no pairwise work,
    * no global sort. `targetPred` is a Column over doc_id — the
    * driver passes the F18 'val' split rule, so the trusted slice is
    * hash-stable and never moves under corpus growth.
    */
  def dsirScore(docs: DataFrame, targetPred: Column,
                nBuckets: Int = DsirBuckets): DataFrame = {
    val (tb, del) = dsirDeltas(docs, targetPred, nBuckets)
    tb.join(del, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("dfp")).as("wfp"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("wfp").cast("double") / lit(1e6), 6).as("logw"),
        (col("wfp") > 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** The F53 feature chain: the per-token (doc_id, bucket) stream and
    * the B-row fixed-point log-ratio table — ONE source for the batch
    * scorer and the G18 frozen-artifact collector, so the two can
    * never disagree about the distribution arithmetic.
    */
  private[graft] def dsirDeltas(docs: DataFrame, targetPred: Column,
                                nBuckets: Int): (DataFrame, DataFrame) = {
    import graft.core.Caching._
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    val tb = docs
      .select(col("doc_id"),
        explode(graft.text.TextFns.tokens(col("text"))).as("token"))
      .select(col("doc_id"),
        (graft.text.TextFns.h60(col("token")) % nBuckets).as("b"))
      .cachedOnce
    val raw = tb.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val tgt = tb.filter(targetPred).groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val tot = broadcast(tb.agg(count(lit(1)).as("rt"),
      count(when(targetPred, 1)).as("tt")))
    // every raw bucket gets a delta row (target ⊆ raw corpus, so the
    // left join loses nothing); add-one smoothing keeps ln finite on
    // target-absent buckets
    val del = broadcast(raw.join(tgt, Seq("b"), "left").crossJoin(tot)
      .select(col("b"),
        round((log((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double") /
            (col("tt") + lit(nBuckets.toLong)).cast("double")) -
          log((col("rc") + lit(1L)).cast("double") /
            (col("rt") + lit(nBuckets.toLong)).cast("double"))) * lit(1e6), 0)
          .cast("long").as("dfp")))
    (tb, del)
  }

  /** The B-row artifact collected for frozen shipping (bounded by
    * construction: ≤ nBuckets rows — the G9-codebook argument).
    */
  def dsirDeltaTable(docs: DataFrame, targetPred: Column,
                     nBuckets: Int = DsirBuckets): Seq[(Long, Long)] =
    dsirDeltas(docs, targetPred, nBuckets)._2.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
}
