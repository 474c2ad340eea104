package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: brute force is the correctness baseline (a broadcast of
  * the query set + one map-side pass over the corpus — embarrassingly
  * parallel, no shuffle except the final top-k, which TakeOrdered keeps
  * at k·partitions rows). The LSH variant buckets the corpus by
  * random-hyperplane signs so each query only scores its bucket — the
  * 100 TB path where scanning every vector per query is impossible.
  * Hyperplanes derive from xxhash64, so planes are identical on every
  * executor with zero broadcast state.
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors of a single query vector (given as a
    * 1-row DataFrame with column `qvec`). */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int): DataFrame = {
    corpus
      .select(col(idCol).as("vec_id"), asDoubles(col(vecCol)).as("v"))
      .crossJoin(broadcast(query.select(asDoubles(col("qvec")).as("q"))))
      .select(col("vec_id"), cosine(col("v"), col("q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** LSH-bucketed all-pairs neighbor search: every vector is assigned a
    * `nBits`-bit hyperplane bucket; candidates are bucket-mates; each
    * vector keeps its `k` nearest by exact cosine re-rank. Recall is
    * tunable via nBits (fewer bits → bigger buckets → higher recall).
    * Hyperplanes are plan-time literals (VectorFunctions.hyperplanes) —
    * deterministic, broadcast-free, and DuckDB-oracle-expressible. */
  def lshNeighbors(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int = 6, k: Int = 3): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val bucketed = corpus
      .select(col(idCol).as("vec_id"), asDoubles(col(vecCol)).as("v"))
      .select(col("vec_id"), col("v"), hyperplaneBits(col("v"), planes).as("bucket"))
    val pairs = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        cosine(col("a.v"), col("b.v")).as("cos"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("vec_id", "neighbor_id", "cos")
  }
}
