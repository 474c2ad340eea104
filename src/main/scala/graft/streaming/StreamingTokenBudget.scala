package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Sampling

/** Streaming twin of the token-budget mixture fill — ADMISSION
  * CONTROL: documents arrive as a stream and each group admits new
  * ones only while its token budget has headroom, the gate a live
  * ingest pipeline runs in front of a training-mix sink (the batch
  * operator plans a mixture at rest; this one enforces it at ingest).
  *
  * Semantics, stated exactly: each micro-batch is admitted by
  * `Sampling.tokenBudgetFillIncremental` against the totals admitted
  * so far — so the result is the CHAINED-INCREMENTAL fill: documents
  * admitted in earlier batches are immutable (they are already in the
  * written mix), and within a batch admission follows the operator's
  * key-stable hash order. Batch boundaries therefore matter, exactly
  * as arrival order matters to any admission controller — replaying
  * the same stream in the same batches reproduces the same mix
  * bit-for-bit (StreamingTokenBudgetSpec proves equality with the
  * hand-chained incremental fills, and single-batch replay equality
  * with the batch fill).
  *
  * State: the per-group admitted-token totals — `groups` longs on the
  * driver, the bounded-model-state convention (the per-batch update is
  * one tiny aggregation of the ADMITTED rows). On restart, rebuild the
  * totals from the sink (the source of truth for what was admitted) and
  * pass them as `initialTotals`; an at-least-once sink should dedup on
  * the document key as usual.
  */
object StreamingTokenBudget {

  /** Admit a streaming frame of documents. `sink` receives each
    * micro-batch's ADMITTED rows (the input columns + `tokens_before`,
    * the batch operator's schema) plus the batch id. Returns the
    * writer (caller sets trigger/checkpoint and starts it). */
  def admit(
      stream: DataFrame, keyCol: String, groupCol: String, tokenCol: String,
      budgets: Seq[(String, Long)],
      sink: (DataFrame, Long) => Unit,
      initialTotals: Map[String, Long] = Map.empty,
      salt: String = "budget", strata: Int = 256): DataStreamWriter[Row] = {
    require(stream.isStreaming, "admit expects a streaming frame")
    val spark = stream.sparkSession
    import spark.implicits._
    val totals = scala.collection.mutable.Map[String, Long](initialTotals.toSeq: _*)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val taken = totals.toSeq.toDF(groupCol, tokenCol)
        val admitted = Sampling.tokenBudgetFillIncremental(
          batch, keyCol, groupCol, tokenCol, budgets, taken, salt, strata)
          .localCheckpoint(true) // pin: the sink AND the totals update read it
        admitted
          .groupBy(col(groupCol))
          .agg(sum(col(tokenCol).cast("long")).as("__adm"))
          .collect()
          .foreach { r =>
            val g = r.getString(0)
            totals(g) = totals.getOrElse(g, 0L) + r.getLong(1)
          }
        sink(admitted, batchId)
      }
  }
}
