package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.QualityClassifier

/** Streaming twin of `QualityClassifier.scoreWithWeights` — score
  * ARRIVING documents under a FROZEN trained weight vector (the model a
  * batch `trainWeights` run persisted: nf+3 plain longs), completing
  * the at-arrival quality stack next to StreamingPerplexity.
  *
  * Unlike the perplexity twin — whose frozen model is corpus-sized
  * count TABLES, forcing stream-static joins and a windowed per-doc
  * re-aggregation — the classifier's model is a few dozen longs that
  * compile into plan literals, and the fixed-point dot product
  * Σ_f w_f·c_f equals the per-row token sum Σ_tokens w[hash(token)], so
  * scoring is `QualityClassifier.scoreRowWise`: a STATELESS projection.
  * No watermark, no state store, no output-mode constraint — and
  * bit-identical to the batch scorer (spec-proven both against the
  * aggregated batch path and on the replayed stream). */
object StreamingQualityClassifier {

  /** Score a streaming document frame; every input column is preserved
    * and (n_tokens, clf_prob, clf_label) are appended — one output row
    * per arriving document, append mode, exactly the batch scorer's
    * values. */
  def scoreStream(stream: DataFrame, idCol: String, textCol: String,
      weights: Array[Long]): DataFrame =
    QualityClassifier.scoreRowWise(stream, idCol, textCol, weights)
}
