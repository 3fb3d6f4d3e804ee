package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F49: deterministic HyperLogLog cardinality sketch (SURVEY.md §2) —
  * the "novel sketch" class of custom operator: distinct counts over
  * 100 TB where the exact `count(DISTINCT x)` shuffle (every distinct
  * value travels) is the thing you cannot afford. HLL (Flajolet et
  * al. 2007, Heule et al. '13 HLL++) reduces a slice's cardinality to
  * m=256 one-byte registers that merge ASSOCIATIVELY (max per bucket)
  * — per-partition partials combine map-side, sketches from different
  * days/slices union by register max without touching the data again.
  *
  * Spark ships `approx_count_distinct` (HLL++), but its sketch is an
  * engine-private binary — unverifiable cross-engine. This one is
  * DETERMINISTIC and engine-portable by construction, the repo's md5
  * discipline applied to a sketch: every derivation is exact integer
  * or string arithmetic both engines share —
  *
  *  - bucket  = first 2 hex digits of md5(value)          (8 bits)
  *  - field   = hex digits 3..15                          (52 bits)
  *  - rho     = leading-zero BITS of field + 1, via hex-string
  *              arithmetic: 4·(leading '0' hex digits) + a 16-case
  *              lookup on the first non-zero digit; all-zero → 53
  *  - register(slice, bucket) = max rho       (the mergeable state)
  *  - S       = Σ 2^(53−register) over all m buckets (absent bucket =
  *              register 0 = 2^53) — each term an EXACT BIGINT via
  *              shift, so the harmonic-mean denominator is an integer
  *              sum, accumulation-order-free (the Lloyd/F23 fixed-point
  *              discipline; summing 2^-register as doubles would round
  *              order-dependently once registers differ by >52)
  *  - raw     = α·m²·2^53 / S — ONE double constant (embedded as the
  *              same shortest-round-trip literal in both engines) and
  *              ONE correctly-rounded division ⇒ bit-identical
  *  - small-range correction (Flajolet): when zero registers remain
  *    and raw ≤ 2.5m, linear counting m·ln(m/V) — the ln pre-rounded
  *    on the 1e-6 grid (the F23 contract; ≤256 distinct ratios exist)
  *
  * Accuracy: σ ≈ 1.04/√m ≈ 6.5% at m=256 — the per-slice corpus-stats
  * regime (vocabulary growth tracking, per-domain distinct counts),
  * not billing.
  */
object Sketch {

  val M = 256
  /** α·m²·2^53 for m=256: one constant, one division — both engines
    * parse the same shortest-repr literal to the same IEEE double.
    */
  val AlphaNum: Double =
    0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble * 9007199254740992.0

  /** (bucket, rho) from a value column — the per-row map-only stage. */
  def hllBucket(v: Column): Column =
    conv(substring(md5(v), 1, 2), 16, 10).cast("long")

  def hllRho(v: Column): Column = rhoFromField(substring(md5(v), 3, 13))

  /** rho from the 13-hex-digit field (exposed for the law spec):
    * leading-zero bits + 1, all in string/integer ops shared verbatim
    * with the oracle SQL.
    */
  def rhoFromField(field: Column): Column = {
    val trimmed = ltrim(field, "0")
    val d = substring(trimmed, 1, 1)
    val extra = when(d.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0L)
      .when(d.isin("4", "5", "6", "7"), 1L)
      .when(d.isin("2", "3"), 2L)
      .otherwise(3L) // '1'
    when(length(trimmed) === 0, lit(53L))
      .otherwise((lit(13L) - length(trimmed)) * 4L + extra + 1L)
  }

  /** Registers per (slice, bucket): ONE map-side-combined max
    * aggregate — ≤ m rows per slice survive the combine, so the
    * shuffle carries registers, not values. This output IS the
    * mergeable sketch artifact.
    */
  def hllRegisters(df: DataFrame, slice: String, value: String): DataFrame =
    df.select(col(slice), hllBucket(col(value)).as("bucket"),
        hllRho(col(value)).as("rho"))
      .groupBy(col(slice), col("bucket"))
      .agg(max(col("rho")).as("register"))

  /** [[hllRegisters]] over a frame whose (slice, value) rows are
    * ALREADY DISTINCT — the F49 instance of the cmsRegistersBatch trade
    * (guide §2.3, aggregate before you shuffle): batch consumers dedup
    * (slice, value) first (a map-side-combined aggregate whose shuffle
    * is bounded by per-partition vocabulary), then run the two md5
    * derivations once per DISTINCT value instead of once per
    * occurrence. The register table is bit-identical: register =
    * max(rho) per (slice, bucket), and max over occurrences ≡ max over
    * distinct values (duplicates cannot change a max — simpler than the
    * CMS count-sum theorem). The one md5 is SHARED by bucket and rho
    * (bucket = hex 1..2, rho = hex 3..15 of the same digest), where
    * [[hllRegisters]] relies on codegen subexpression elimination.
    * Kept separate from [[hllRegisters]] for the same reason as
    * [[cmsRegistersBatch]]: a streaming consumer must stay a single
    * aggregation (chained stateful aggregates are illegal).
    */
  def hllRegistersBatch(df: DataFrame, slice: String, value: String): DataFrame =
    hllRegistersDistinct(df.select(col(slice), col(value)).distinct(), slice, value)

  /** The post-distinct tail of [[hllRegistersBatch]] — callers that
    * already hold a DISTINCT (slice, value) frame (e.g. one shared with
    * an exact countDistinct) skip the redundant exchange. Input rows
    * MUST be distinct per (slice, value); duplicates would not change
    * the result (max is duplicate-blind) but would re-pay the hashing
    * this variant exists to avoid.
    */
  def hllRegistersDistinct(distinctDf: DataFrame, slice: String,
                           value: String): DataFrame =
    distinctDf
      .select(col(slice), md5(col(value)).as("__hll_h"))
      .select(col(slice),
        conv(substring(col("__hll_h"), 1, 2), 16, 10).cast("long").as("bucket"),
        rhoFromField(substring(col("__hll_h"), 3, 13)).as("rho"))
      .groupBy(col(slice), col("bucket"))
      .agg(max(col("rho")).as("register"))

  /** Union of sketches = register max across slices — the
    * associativity that makes the sketch a 100 TB operator (daily
    * sketches fold into monthly without rescanning).
    */
  def hllMergeAll(regs: DataFrame, asSlice: String, slice: String): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("register")).as("register"))
      .withColumn(slice, lit(asSlice))

  // ---- F54: deterministic log-bucket quantile sketch ----------------

  /** Sub-buckets per binary octave for the F54 quantile sketch:
    * relative value error within a bucket ≤ 1/QSub ≈ 6% (the
    * DDSketch / HDR-histogram accuracy model at γ ≈ 1 + 1/16).
    */
  val QSub = 16

  /** F54 registers: per-(slice, bucket) COUNTS over a log-bucketed
    * integer value — p50/p95/p99 per slice over 100 TB without a
    * global sort. The F49 determinism discipline applied to
    * percentiles: the bucket id is pure INTEGER arithmetic both
    * engines share —
    *
    *  - e  = floor(log₂ v) via the BINARY-STRING length (`bin()` in
    *         both engines; no float log, so no off-by-one at exact
    *         powers of two)
    *  - p  = 2^e (an exact shift)
    *  - id = e·QSub + ((v − p)·QSub div p);  v ≤ 0 → the −1 underflow
    *         bucket
    *
    * ONE map-side-combined count aggregate; ≤ ~64·QSub rows per slice
    * survive the combine, so the shuffle carries registers, not
    * values. Counts merge ASSOCIATIVELY (integer sums) — daily
    * sketches fold into monthly without rescanning, the same closure
    * [[hllMergeAll]] gives cardinalities.
    */
  def qRegisters(df: DataFrame, slice: String, value: Column): DataFrame =
    df.select(col(slice), value.cast("long").as("v"))
      .withColumn("e", (length(bin(col("v"))) - 1).cast("int"))
      .withColumn("p", expr("shiftleft(cast(1 as bigint), e)"))
      .withColumn("qb",
        when(col("v") <= 0, lit(-1L))
          .otherwise(col("e").cast("long") * QSub +
            expr(s"(v - p) * $QSub div p")))
      .groupBy(col(slice), col("qb"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge two F54 sketches: per-(slice, bucket) count sums —
    * merge ≡ direct by sum associativity (the F49b theorem's twin).
    */
  def qMerge(a: DataFrame, b: DataFrame, slice: String): DataFrame =
    a.unionByName(b).groupBy(col(slice), col("qb"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** All slices folded into one sketch under `asSlice` — the '*' row. */
  def qMergeAll(regs: DataFrame, asSlice: String, slice: String): DataFrame =
    regs.groupBy(col("qb")).agg(sum(col("cnt")).cast("long").as("cnt"))
      .withColumn(slice, lit(asSlice))

  /** Quantile estimates from F54 registers: for each q (basis points),
    * rank = q·(n−1) div 10000 and the estimate is the LOWER BOUND of
    * the first bucket whose cumulative count exceeds the rank —
    * integer arithmetic end to end, so both engines agree bit-for-bit
    * (no interpolation, no float ranks). K-row input (the register
    * table), one cumulative window per slice.
    */
  def qEstimate(regs: DataFrame, slice: String, qsBp: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy(col(slice)).orderBy(col("qb"))
    val wa = Window.partitionBy(col(slice))
    regs
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("n", sum(col("cnt")).over(wa))
      .select(col(slice), col("qb"), col("cum"), col("n"),
        explode(array(qsBp.map(q => lit(q.toLong)): _*)).as("q_bp"))
      .withColumn("rank", expr("q_bp * (n - 1) div 10000"))
      .filter(col("cum") > col("rank"))
      .groupBy(col(slice), col("q_bp"))
      .agg(min(col("qb")).as("qb"))
      .withColumn("e", expr(s"cast(qb div $QSub as int)"))
      .withColumn("p", expr("shiftleft(cast(1 as bigint), e)"))
      .select(col(slice), col("q_bp"),
        when(col("qb") < 0, lit(0L))
          .otherwise(col("p") + expr(s"(qb % $QSub) * p div $QSub"))
          .as("q_est"))
  }

  // ---- F58: deterministic Count-Min heavy-hitter sketch --------------

  /** CMS depth (independent hash rows) and width (counters per row):
    * point estimates over-count by ≤ εN with ε = e/CmsW per row and
    * failure probability δ = e^−CmsD across the min — the classic
    * Cormode-Muthukrishnan bounds, here with DETERMINISTIC md5-salted
    * rows so both engines build bit-identical tables.
    */
  val CmsD = 4
  val CmsW = 1024

  /** F58 registers: the Count-Min table per slice — for each of CmsD
    * salted hash rows, counts into CmsW buckets
    * (h60('#cms⟨i⟩#' ++ value) mod CmsW). Counter sums are integer and
    * order-free, so tables MERGE by elementwise addition (unlike
    * Misra-Gries/SpaceSaving, whose result depends on stream order —
    * unusable for a cross-engine oracle). ONE map-side-combined count
    * aggregate; ≤ CmsD·CmsW rows per slice survive the combine.
    */
  def cmsRegisters(df: DataFrame, slice: String, value: Column): DataFrame =
    df.select(col(slice).as("slice"), value.cast("string").as("v"))
      .select(col("slice"), col("v"),
        explode(array((0 until CmsD).map(lit(_)): _*)).as("row"))
      .select(col("slice"), col("row"),
        (graft.text.TextFns.h60(
          concat(lit("#cms"), col("row").cast("string"), lit("#"), col("v")))
          % CmsW).as("bucket"))
      .groupBy(col("slice"), col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** [[cmsRegisters]] for BATCH sweeps: count occurrences per
    * (slice, value) FIRST (map-side combined), so the CmsD salted md5s
    * run once per DISTINCT value instead of once per occurrence — the
    * hashing was the stage's dominant CPU (4 md5 + hex-conv per token
    * occurrence at sf0.1), and the register table is the identical
    * elementwise sum either way (guide §2.3, aggregate before you
    * shuffle; count-sum associativity — the same theorem cmsMerge
    * rests on). Kept SEPARATE from [[cmsRegisters]] because the
    * streaming twin must stay a single aggregation: Structured
    * Streaming rejects chained stateful aggregates, and the G23 state
    * contract is "the state IS the ≤ CmsD·CmsW register table" — a
    * pre-aggregation there would grow state with vocabulary. The
    * G23 spec pins streamed ≡ batch registers, so the two shapes
    * cannot drift silently.
    */
  def cmsRegistersBatch(df: DataFrame, slice: String, value: Column): DataFrame =
    df.select(col(slice).as("slice"), value.cast("string").as("v"))
      .groupBy(col("slice"), col("v")).agg(count(lit(1)).as("vc"))
      .select(col("slice"), col("vc"), col("v"),
        explode(array((0 until CmsD).map(lit(_)): _*)).as("row"))
      .select(col("slice"), col("row"), col("vc"),
        (graft.text.TextFns.h60(
          concat(lit("#cms"), col("row").cast("string"), lit("#"), col("v")))
          % CmsW).as("bucket"))
      .groupBy(col("slice"), col("row"), col("bucket"))
      .agg(sum(col("vc")).cast("long").as("cnt"))

  /** Merge two CMS tables: elementwise counter sums — merge ≡ direct
    * by addition associativity (the F49b/F54b theorem, third instance).
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("slice"), col("row"), col("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Point estimates for a candidate set: each candidate hashes into
    * its CmsD buckets, joins the register table, and the MIN across
    * rows is the estimate (never an under-count: every bucket holds
    * the true count plus non-negative collisions — the one absolute
    * CMS guarantee, pinned by spec). Candidates are K-row
    * (broadcast); the register table is ≤ slices·CmsD·CmsW rows.
    */
  def cmsEstimate(regs: DataFrame, candidates: DataFrame,
                  valueCol: String): DataFrame = {
    val probes = candidates
      .select(col("slice"), col(valueCol).cast("string").as("v"))
      .select(col("slice"), col("v"),
        explode(array((0 until CmsD).map(lit(_)): _*)).as("row"))
      .select(col("slice"), col("v"), col("row"),
        (graft.text.TextFns.h60(
          concat(lit("#cms"), col("row").cast("string"), lit("#"), col("v")))
          % CmsW).as("bucket"))
    probes.join(regs, Seq("slice", "row", "bucket"), "left")
      .groupBy(col("slice"), col("v").as(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Estimate per slice from registers: integer-exact harmonic-mean
    * denominator, one double division, Flajolet small-range branch.
    */
  def hllEstimate(regs: DataFrame, slice: String): DataFrame =
    regs.groupBy(col(slice))
      .agg(sum(expr("shiftleft(1L, cast(53 - register as int))")).as("sp"),
        count(lit(1)).as("nb"))
      .withColumn("v0", lit(M.toLong) - col("nb"))
      .withColumn("s", col("sp") + col("v0") * lit(1L << 53))
      .withColumn("raw", lit(AlphaNum) / col("s").cast("double"))
      .select(col(slice),
        round(when(col("v0") > 0 && col("raw") <= lit(2.5 * M),
          round(log(lit(M.toDouble) / col("v0").cast("double")) * 1e6, 0)
            / 1e6 * M.toDouble)
          .otherwise(col("raw")), 4).as("hll_est"))
}
