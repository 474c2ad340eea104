package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

class SimilaritySearchSpec extends SparkSpecBase {

  test("bruteForceTopK returns k rows ordered by descending cosine in [-1,1]") {
    val emb = Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val top = SimilaritySearch.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", query, 10)
      .collect()
    assert(top.length === 10)
    val cos = top.map(_.getAs[Double]("cos"))
    assert(cos.sameElements(cos.sorted.reverse))
    assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("lshNeighbors keeps at most k neighbors per vector and respects bucket locality") {
    val nn = SimilaritySearch.lshNeighbors(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", dim = 64, nBits = 6, k = 3)
      .collect()
    val perVec = nn.groupBy(_.getAs[Long]("vec_id")).values.map(_.length)
    assert(perVec.forall(_ <= 3))
    assert(nn.nonEmpty)
  }

  test("lshNeighbors with few bits approaches brute-force recall for top-1") {
    val emb = Tables.embeddings(spark, sfDir)
    // ground truth top-1 for each of the first 20 vectors
    val nn = SimilaritySearch.lshNeighbors(emb, "vec_id", "embedding",
      dim = 64, nBits = 2, k = 1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neighbor_id")).toMap
    var hits = 0
    var total = 0
    for (q <- 0L until 20L) {
      val query = emb.filter(col("vec_id") === q).select(col("embedding").as("qvec"))
      val best = SimilaritySearch.bruteForceTopK(
        emb.filter(col("vec_id") =!= q), "vec_id", "embedding", query, 1)
        .collect().head.getAs[Long]("vec_id")
      total += 1
      if (nn.get(q).contains(best)) hits += 1
    }
    // 2 hyperplanes → 4 buckets → ~25% of the corpus per bucket; top-1
    // recall should be far above random but is not guaranteed — assert a
    // conservative floor.
    assert(hits.toDouble / total >= 0.2, s"recall@1 = $hits/$total")
  }
}
