package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Retrieval-quality gates for the approximate operators — the second
  * bar next to the parity oracle: measured recall vs exact ground truth
  * must clear stated floors at the documented production posture (the
  * same numbers Bench emits in its `recall` field; see the knob table
  * in README). Floors are set by RecallProbe's sweep at sf0.1 with
  * margin: the sf0.1 corpus is near-uniform random (true top-1 cosine
  * median ≈ 0.41 — the ANN worst case), so these are LOWER bounds on
  * clustered real-corpus behavior. Random-guess recall@3 at n=2000 is
  * ≈ 0.0015.
  *
  * Measured at the posture under test (sweep, 2026-08):
  *   lsh nTables=1 0.24 · nTables=4 0.67 · nTables=8 0.90
  *   ivf nProbe=8: 0.76 sampled quantizer, 0.81 Lloyd-refined (the
  *   bench posture, refineIters=2) · minhash-vs-exact(0.8) 1.00
  */
class RecallSpec extends SparkSpecBase {

  val sf01 = "/root/testdata/sf0.1"

  lazy val measured: Map[String, Double] =
    graft.Bench.measureRecall(spark, sf01).toMap

  test("LSH recall amplification clears 0.8 at 8 tables on the worst-case corpus") {
    assert(measured("ss_ann_lsh_t8") >= 0.8, s"measured: $measured")
    // single-table is the cost floor, not the recall posture — but it
    // must still be far above random guessing (0.0015 at this n/k)
    assert(measured("ss_ann_lsh_t1") >= 0.15, s"measured: $measured")
    assert(measured("ss_ann_lsh_t8") > measured("ss_ann_lsh_t1"))
  }

  test("IVF at nProbe=8 clears 0.7 on the worst-case corpus") {
    assert(measured("ss_ann_ivf_p8") >= 0.7, s"measured: $measured")
  }

  test("MinHash finds ≥90% of exact ≥0.8-Jaccard near-duplicate pairs") {
    assert(measured("dd_minhash") >= 0.9, s"measured: $measured")
  }

  test("recallAtK: identity is 1.0, disjoint is 0.0, absent queries count as misses") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("vec_id", "neighbor_id")
    assert(Recall.recallAtK(truth, truth) === 1.0)
    val none = Seq((1L, 99L)).toDF("vec_id", "neighbor_id")
    assert(Recall.recallAtK(none, truth) === 0.0)
    // query 2 entirely missing from approx → its 2 truth entries are misses
    val half = Seq((1L, 10L), (1L, 11L)).toDF("vec_id", "neighbor_id")
    assert(Recall.recallAtK(half, truth) === 0.5)
  }

  test("pairRecall is orientation-insensitive") {
    import spark.implicits._
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val foundFlipped = Seq((2L, 1L)).toDF("doc_a", "doc_b")
    assert(Recall.pairRecall(foundFlipped, truth) === 0.5)
  }

  test("bruteForceNeighbors: k rows per sampled query in exact descending-cosine order") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val bf = Recall.bruteForceNeighbors(emb, "vec_id", "embedding", k = 5, sampleEveryNth = 100)
      .collect()
    val byQ = bf.groupBy(_.getAs[Long]("vec_id"))
    assert(byQ.nonEmpty && byQ.values.forall(_.length === 5))
    // spot-check one query against the single-query brute force
    val q = byQ.keys.min
    val query = emb.filter(col("vec_id") === q).select(col("embedding").as("qvec"))
    val expected = SimilaritySearch.bruteForceTopK(
      emb.filter(col("vec_id") =!= q), "vec_id", "embedding", query, 5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val got = byQ(q).sortBy(r => (-r.getAs[Double]("cos"), r.getAs[Long]("neighbor_id")))
      .map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got === expected)
  }
}
