package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

/** Differential gate for the round-18 NATIVE visitor×pool scorer
  * (plans.ScoreTopK): per-visitor top-k over the bucket pool must
  * reproduce the HOF walk's neighbors BIT-FOR-BIT — same sequential-dot
  * cosines, same (cos DESC, id ASC) rank, same per-table/per-cell
  * candidate sets under dormant AND engaged pool caps. The HOF
  * reference is the same code path every pre-round-18 gate ran:
  * `lshNeighbors`/`ivfNeighbors` fall back to it whenever the id column
  * is not a long, so widening vec_id to decimal(18,0) drives the
  * identical query through the old walk. */
class ScoreTopKNativeSpec extends SparkSpecBase {

  private def emb: DataFrame = Tables.embeddings(spark, sfDir)
  private def embDec: DataFrame =
    emb.select(col("vec_id").cast("decimal(18,0)").as("vec_id"), col("embedding"))

  private def canon(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("vec_id").cast("long"), col("neighbor_id").cast("long"),
      col("cos").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("native lshNeighbors == HOF walk (single table, several configs)") {
    for ((bits, k) <- Seq((1, 3), (3, 5))) {
      val n = canon(SimilaritySearch.lshNeighbors(
        emb, "vec_id", "embedding", dim = 64, nBits = bits, k = k))
      val h = canon(SimilaritySearch.lshNeighbors(
        embDec, "vec_id", "embedding", dim = 64, nBits = bits, k = k))
      assert(n === h, s"nBits=$bits k=$k single-table mismatch")
      assert(n.nonEmpty, s"nBits=$bits single-table found nothing — vacuous")
    }
  }

  test("native lshNeighbors == HOF walk (multi table, engaged pool cap)") {
    for ((tables, cap) <- Seq((2, None), (8, None), (2, Some(4)), (8, Some(8)))) {
      val n = canon(SimilaritySearch.lshNeighbors(
        emb, "vec_id", "embedding", dim = 64, nBits = 2, k = 3,
        nTables = tables, maxBucket = cap))
      val h = canon(SimilaritySearch.lshNeighbors(
        embDec, "vec_id", "embedding", dim = 64, nBits = 2, k = 3,
        nTables = tables, maxBucket = cap))
      assert(n === h, s"tables=$tables cap=$cap multi-table mismatch")
      assert(n.nonEmpty, s"tables=$tables cap=$cap found nothing — vacuous")
    }
  }

  test("native ivfNeighbors == HOF walk (dormant + engaged pool cap)") {
    for (cap <- Seq(None, Some(16))) {
      val n = canon(SimilaritySearch.ivfNeighbors(
        emb, "vec_id", "embedding", dim = 64, nCentroids = 8, nProbe = 2,
        k = 3, maxBucket = cap))
      val h = canon(SimilaritySearch.ivfNeighbors(
        embDec, "vec_id", "embedding", dim = 64, nCentroids = 8, nProbe = 2,
        k = 3, maxBucket = cap))
      assert(n === h, s"cap=$cap ivf mismatch")
      assert(n.nonEmpty, s"cap=$cap ivf found nothing — vacuous")
    }
  }
}
