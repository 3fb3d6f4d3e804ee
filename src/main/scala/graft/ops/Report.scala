package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F26: per-(source, lang) corpus reporting — the aggregate a pipeline
  * run publishes per corpus slice so rebalancing (F24), gating (G8),
  * and dedup decisions are made against numbers instead of folklore:
  * document and token counts, mean quality score, and the exact-dup
  * count attributed to the slice each duplicate LIVES in (its keeper
  * may sit in another slice).
  *
  * Scale shape: per-doc signals (n_tokens, score, content md5) are
  * map-only projections sharing one source with F8/G8
  * ([[graft.text.Analysis.scoreSignals]]); the dup flag needs the
  * corpus-wide md5 group (one shuffle, whose exchange the flag join
  * then reuses — both sides arrive partitioned by content_md5); the
  * final per-slice rollup is a low-cardinality groupBy with map-side
  * partial aggregation. Mean score goes through the FIXED-POINT mean
  * (1e-6-grid integer sum / count — the F23/Lloyd contract), so
  * accumulation order can never shift the 4-dp result between
  * engines or between partitionings.
  */
object Report {

  def corpusReport(docs: DataFrame): DataFrame = {
    val (nTokens, score) = graft.text.Analysis.scoreSignals
    val sig = docs.select(col("doc_id"), col("source"), col("lang"),
      nTokens.as("n_tokens"), score.as("score"),
      md5(col("text")).as("content_md5"))
    val keepers = sig.groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"))
    sig.join(keepers, "content_md5")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(sum(round(col("score") * 1e6, 0).cast("long")).cast("double")
          / (count(lit(1)) * 1e6) - 1e-9, 4).as("mean_score"),
        sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
          .as("n_exact_dups"))
      .orderBy(col("source"), col("lang"))
  }
}
