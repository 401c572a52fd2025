package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Tokenize

/**
 * Streaming trending-term detection — windowed term frequencies over a
 * document stream (the live analytics twin of the batch
 * [[graft.pipeline.TextAnalysis]] surface; the reference's streaming story
 * stops at ingest, this extends it the way its BM25 stats extend batch
 * text search).
 *
 * Split: the STREAM maintains per-(window, term) counts — an incremental,
 * watermark-finalized aggregation the state store handles at any rate —
 * and ranking happens batch-side over the emitted (closed) windows.
 * Top-k-per-window inside the streaming query would need a rank over a
 * still-open window's partial counts: semantically undefined under append
 * mode, so the operator deliberately does not offer it.
 *
 * Emission rule (append mode): a (window, term) count row emits exactly
 * once, when the watermark passes the window end — micro-batch-independent,
 * so any batch engine replays the output as plain windowed counts
 * restricted to windows whose end precedes the final watermark.
 *
 * Scale shape: explode → ONE streaming hash-agg keyed by (window, term)
 * with partial aggregation before the shuffle; state is bounded by
 * (windows in flight) × (distinct terms), and closed windows leave the
 * store at their watermark. Tokenization is the same codegen'd word kernel
 * as the batch path.
 */
object TrendingTerms {

  /**
   * Streaming phase: per-(window, term) counts. `docs` must be a streaming
   * frame; an event-time watermark is applied here on `tsCol`.
   * Emits (window_start_ms, term, cnt) rows as windows close.
   */
  def termCounts(docs: DataFrame, tsCol: String, textCol: String,
                 windowDuration: String, watermarkDelay: String = "0 seconds"): DataFrame =
    docs.withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(Tokenize.word(col(textCol))).as("term"))
      .groupBy(window(col(tsCol), windowDuration), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("term"), col("cnt"))

  /**
   * Batch phase over the sink: top-`k` terms of every closed window
   * (count desc, term asc ties). The window partition bounds the rank —
   * rows beyond rank k never leave their partition.
   */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    require(k > 0, "topK: k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start_ms"))
      .orderBy(col("cnt").desc, col("term").asc)
    counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
