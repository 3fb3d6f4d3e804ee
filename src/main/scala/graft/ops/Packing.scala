package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFns

/** F27: token-budget corpus packing — the shard builder a pretraining
  * pipeline runs last: documents are laid out in a deterministic
  * hash-shuffled order (h60(doc_id) — decorrelates shard content from
  * crawl order, the same argument as F18/F24's hash stability) and cut
  * into shards of ~`budget` tokens by the running token total; a doc
  * belongs to the shard its FIRST token lands in.
  *
  * The global running total is a distributed two-pass prefix sum —
  * the one operation here that naively needs a global sort: bucket by
  * the TOP `bucketBits` bits of h60 (so each bucket is a contiguous
  * RANGE of the global order), compute the within-bucket prefix sum
  * with an ordinary partitioned window, and add per-bucket offsets
  * computed over the 2^bucketBits bucket totals (bounded; derived with
  * a bounded triangular self-join rather than a single-partition
  * window, so no stage ever funnels the corpus through one task). At
  * 100 TB raise `bucketBits` so a bucket's rows fit one window
  * partition — the plan shape is unchanged.
  *
  * Note the deliberate contrast with F18/F24: a doc's SHARD is a
  * function of the whole corpus (packing is global by definition —
  * inserting a doc shifts everything after it); what is stable is the
  * ORDER (pure h60), which is why the layout is reproducible run to
  * run on the same corpus.
  */
object Packing {

  /** F56: SLIDING-WINDOW context chunking — the training-example
    * generator F27 doesn't cover (F27 lays whole docs into shards;
    * this cuts ONE long document into fixed-length contexts with
    * overlap, the HF `return_overflowing_tokens`/RAG-chunker shape):
    * window k of a doc with n tokens covers token positions
    * [k·step, min(k·step + w, n)) for k in [0, K), step = w − overlap,
    * K = 1 for n ≤ w else 1 + ⌈(n−w)/step⌉ — so every token is
    * covered, consecutive windows share exactly `overlap` tokens, and
    * only the final window may run short. Pure integer arithmetic +
    * an md5 of the window's joined tokens as the content witness, so
    * the oracle replays every boundary and byte.
    *
    * Scale shape: MAP-ONLY — one in-row `sequence` explode per doc,
    * no shuffle anywhere; output rows ≈ Σ n/step. At 100 TB this is
    * the shape you want: chunking parallelizes embarrassingly and the
    * plan stays one whole-stage-codegen pass over the scan.
    */
  def windowChunks(docs: DataFrame, window: Int, overlap: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1 (got $window)")
    require(overlap >= 0 && overlap < window,
      s"overlap in [0, window) (got $overlap for window $window)")
    val step = window - overlap
    val toks = TextFns.tokens(col("text"))
    docs
      .select(col("doc_id"), toks.as("toks"),
        size(toks).cast("long").as("n"))
      // integer ceil-division via `div` (Column `/` on longs widens to
      // double silently — the F35 lesson)
      .withColumn("nk", when(col("n") <= window, lit(1L))
        .otherwise(lit(1L) + expr(s"(n - $window + ${step - 1}) div $step")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("nk") - 1)).as("k"))
      .select(col("doc_id"), col("k"),
        (col("k") * step).as("start"),
        least(lit(window.toLong), col("n") - col("k") * step).as("len"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("k") * step + 1).cast("int"),
            least(lit(window.toLong), col("n") - col("k") * step).cast("int"))))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("k"))
  }

  def pack(docs: DataFrame, budget: Long, bucketBits: Int = 8): DataFrame = {
    require(budget > 0, s"token budget must be positive (got $budget)")
    require(bucketBits >= 1 && bucketBits <= 20, s"bucketBits in [1,20]")
    val base = docs.select(col("doc_id"),
      TextFns.h60(col("doc_id").cast("string")).as("h"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      // h60 is 60 bits; the top bucketBits bits keep buckets contiguous
      // in the global (h, doc_id) order
      .withColumn("b", shiftright(col("h"), 60 - bucketBits))
    val w = Window.partitionBy(col("b")).orderBy(col("h"), col("doc_id"))
    val withinCum = base.withColumn("wcum", sum(col("n_tokens")).over(w))
    val totals = base.groupBy(col("b")).agg(sum(col("n_tokens")).as("btot"))
    // per-bucket offsets: triangular self-join over the BOUNDED totals
    // (2^bucketBits rows) — sum of all strictly-earlier bucket totals
    val offsets = totals.as("a")
      .join(totals.select(col("b").as("pb"), col("btot").as("ptot")),
        col("pb") < col("a.b"), "left")
      .groupBy(col("a.b").as("b"))
      .agg(coalesce(sum(col("ptot")), lit(0L)).as("off"))
    withinCum.join(broadcast(offsets), "b")
      .withColumn("cum", col("off") + col("wcum"))
      .select(col("doc_id"), col("n_tokens"), col("cum"),
        ((col("cum") - col("n_tokens")) / budget).cast("long").as("shard"))
      .orderBy(col("doc_id"))
  }
}
