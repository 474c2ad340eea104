package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sequence packing — assigning documents to fixed-token-
  * budget training sequences (the step between a curated corpus and a
  * dataloader). Contiguous-fill strategy: documents are sharded by a
  * stable key hash, ordered by id within the shard, and a running token
  * offset places each doc in pack floor(offset / budget). Properties:
  *
  *   - fully deterministic: shard, order, and offsets are pure functions
  *     of (id, token count) — two runs, or Spark vs any other engine,
  *     produce identical packing (oracle-gated);
  *   - scale-safe: the only window is per SHARD (pick nShards ≈
  *     cluster parallelism; each shard's cumsum is one sorted partition
  *     stream, never a global sort);
  *   - packs are ≈budget tokens: a doc may straddle a boundary (its
  *     offset names its pack) — the standard contiguous-fill trade; use
  *     budget >> max doc tokens to bound overflow.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long, nShards: Int): DataFrame = {
    require(tokenBudget > 0 && nShards > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"),
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"))
      .withColumn("offset", sum("n_tokens").over(w) - col("n_tokens"))
      .select(
        col(idCol), col("shard"), col("n_tokens"), col("offset"),
        floor(col("offset") / tokenBudget).as("pack_id"))
  }
}
