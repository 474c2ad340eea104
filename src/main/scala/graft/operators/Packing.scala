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
  /** Context-window chunking: split each document into `chunkTokens`-token
    * chunks with `overlap` tokens of context carried between consecutive
    * chunks — how long documents are fitted to a model's window without
    * losing cross-boundary context. Deterministic integer arithmetic +
    * one explode; a doc with ≤ chunkTokens tokens yields exactly one
    * chunk. Scan-shaped: no shuffle, output rows ≈ corpus_tokens/stride.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val n = size(col("__toks"))
    val nChunks = when(n <= chunkTokens, lit(1L))
      .otherwise(floor((n - chunkTokens + stride - 1).cast("double") / stride)
        .cast("long") + 1L)
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1)))
      .select(
        col(idCol), col("chunk_idx"),
        slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)).as("__chunk"))
      .select(
        col(idCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

}
