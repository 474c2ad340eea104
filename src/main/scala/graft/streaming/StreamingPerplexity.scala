package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming twin of `TextAnalysis.bigramPerplexityFromModel` — score
  * ARRIVING documents under a FROZEN (persisted, corpus-version-pinned)
  * bigram LM, the quality signal computed at ingest time instead of in
  * a nightly sweep.
  *
  * Shape: the model tables are STATIC (loaded from the persisted
  * parquet the batch trainer wrote — `TextAnalysis.bigramLmModel`'s
  * plain-column contract), so scoring is exploded doc-bigrams →
  * stream-static left equi-joins against the count tables → one
  * per-(window, doc) aggregation. It is the SAME operator body —
  * `bigramPerplexityFromModel` with the event-time window passed as a
  * carry/grouping column — so the streaming scores CANNOT drift from
  * batch scores (StreamingPerplexitySpec proves replayed-corpus
  * equality down to the 6-dp doubles).
  *
  * State contract: per-document aggregation state lives only until the
  * document's event-time window expires past the watermark (a document
  * arrives whole in one row, so its state completes within its
  * micro-batch; the watermark exists to EXPIRE it, not to wait for
  * stragglers). Out-of-model tokens take the smoothed-zero uniform
  * floor exactly as in batch — new text scores without retraining,
  * which is the point of freezing the model per corpus version.
  */
object StreamingPerplexity {

  /** Score a streaming document frame. `stream` must carry `idCol`,
    * `textCol`, and an event-time `timeCol`; output is one append-mode
    * row per scored document: (idCol, n_bigrams, perplexity) — docs
    * under 2 tokens have no bigram evidence and no row, the batch
    * convention. */
  def scoreStream(stream: DataFrame, idCol: String, textCol: String,
      timeCol: String, uni: DataFrame, bi: DataFrame,
      alpha: Double = 1.0, roundDp: Int = 6,
      horizonMinutes: Int = 10): DataFrame = {
    val win: Column = window(col(timeCol), s"$horizonMinutes minutes")
    TextAnalysis.bigramPerplexityFromModel(
      stream.withWatermark(timeCol, s"$horizonMinutes minutes"),
      idCol, textCol, uni, bi, alpha, roundDp,
      carry = Seq("__win" -> win))
      .drop("__win")
  }
}
