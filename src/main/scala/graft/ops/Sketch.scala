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

  /** Union of sketches = register max across slices — the
    * associativity that makes the sketch a 100 TB operator (daily
    * sketches fold into monthly without rescanning).
    */
  def hllMergeAll(regs: DataFrame, asSlice: String, slice: String): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("register")).as("register"))
      .withColumn(slice, lit(asSlice))

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
