package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpecBase {

  private val dim = 64

  private def corpus = Tables.embeddings(spark, sfDir)
    .filter(col("vec_id") =!= 0)

  test("encode emits m dense byte-range codes per vector as a pure projection") {
    val books = ProductQuantization.trainCodebooks(
      corpus, "vec_id", "embedding", dim = dim, m = 8, k = 16, iters = 1)
    val enc = ProductQuantization.encode(corpus, "vec_id", "embedding", books, dim)
    val p = enc.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"encoding must be shuffle-free:\n$p")
    val rows = enc.collect()
    assert(rows.length === corpus.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 8)
      assert(codes.forall(c => c >= 0 && c < 16), s"codes out of range: $codes")
    }
    // 64-dim float (256 B) → 8 byte-range codes: the 32× compression
    // that makes a 100 TB vector index memory-resident
  }

  test("codebook training is deterministic and means are rounded to roundDp") {
    val b1 = ProductQuantization.trainCodebooks(
      corpus, "vec_id", "embedding", dim = dim, m = 8, k = 16, iters = 1)
    val b2 = ProductQuantization.trainCodebooks(
      corpus, "vec_id", "embedding", dim = dim, m = 8, k = 16, iters = 1)
    assert(b1.size === 8 && b1.forall(_.size === 16))
    b1.zip(b2).foreach { case (x, y) =>
      x.zip(y).foreach { case ((cid1, c1), (cid2, c2)) =>
        assert(cid1 === cid2)
        assert(c1.toSeq === c2.toSeq)
      }
    }
    // every trained component is a 6-dp fixed-point value (the
    // cross-engine rounding contract shared with Clustering)
    val seedIds = b1.head.map(_._1).toSet
    b1.flatten.foreach { case (cid, c) =>
      assert(c.length === 8)
      if (!seedIds.contains(cid)) fail("codebook ids must be the seed ids")
      c.foreach { x =>
        val scaled = x * 1e6
        assert(math.abs(scaled - math.rint(scaled)) < 1e-6,
          s"component $x not rounded to 6dp")
      }
    }
  }

  test("pqTopK with exact re-rank recovers >=0.8 of the brute-force top-10 on the worst-case corpus") {
    val query = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val exact = SimilaritySearch.bruteForceTopK(
      corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val pq = ProductQuantization.pqTopK(
      corpus, "vec_id", "embedding", query, dim = dim)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"PQ recall@10 $recall — i.i.d. unit vectors are the quantizer's worst case")
  }

  test("pqTopKFromCodes over the stored index equals the from-vectors search row-for-row") {
    val query = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val books = ProductQuantization.trainCodebooks(
      corpus, "vec_id", "embedding", dim = dim, m = 8, k = 16, iters = 1)
    val enc = ProductQuantization.encode(corpus, "vec_id", "embedding", books, dim)
    val fromCodes = ProductQuantization.pqTopKFromCodes(
      enc, corpus, "vec_id", "embedding", query, books)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromVectors = ProductQuantization.pqTopK(
      corpus, "vec_id", "embedding", query, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromCodes === fromVectors,
      "stored-code search must reproduce the from-vectors pipeline exactly")
  }

  test("ivfPqTopK with full probe equals pqTopK; partial probe keeps >=0.7 of its top-10") {
    val query = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val pq = ProductQuantization.pqTopK(
      corpus, "vec_id", "embedding", query, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fullProbe = ProductQuantization.ivfPqTopK(
      corpus, "vec_id", "embedding", query, dim = dim, nCells = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fullProbe === pq, "nProbe = nCells must be bit-identical to the flat PQ search")
    val partial = ProductQuantization.ivfPqTopK(
      corpus, "vec_id", "embedding", query, dim = dim, nCells = 16, nProbe = 8)
      .collect().map(_.getLong(0)).toSet
    val overlap = (partial & pq.map(_._1).toSet).size.toDouble / pq.size
    assert(overlap >= 0.7,
      s"half-probe IVF-PQ kept $overlap of the flat PQ top-10 — i.i.d. worst case")
  }

  test("rerankFor scales with the corpus but never exceeds MaxRerankPool") {
    assert(ProductQuantization.rerankFor(10) === 100) // flat-fixture floor
    assert(ProductQuantization.rerankFor(10000) === 2000) // 20% regime
    // a 10^10-vector corpus must NOT get a 2*10^9-row pool: the absolute
    // ceiling is the guard against the one-task rerank blowup
    assert(ProductQuantization.rerankFor(10000000000L) ===
      ProductQuantization.MaxRerankPool)
    assert(ProductQuantization.rerankFor(10000000000L, maxPool = 50000) === 50000)
    intercept[IllegalArgumentException] {
      ProductQuantization.rerankFor(1000, maxPool = 10) // below the floor
    }
  }

  test("adcPool's two-level reduction selects exactly the single-gather rows") {
    // force the distributed path (rerank > SingleGatherMax) on a corpus
    // large enough that the per-partition heaps actually evict, and
    // check it returns byte-for-byte the rows the plain TakeOrdered
    // would, with non-key payload columns restored by the join-back
    val n = 20000
    val rerank = ProductQuantization.SingleGatherMax + 1
    val scored = spark.range(n.toLong).select(
      col("id").as("vec_id"),
      (pmod(col("id") * 2654435761L, lit(99991L)).cast("double") / 7.0).as("score"),
      concat(lit("p"), col("id")).as("tag"))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getDouble(1), r.getString(2))
    val got = ProductQuantization.adcPool(scored, rerank)
      .select("vec_id", "score", "tag").collect().map(key).sortBy(x => (x._1, x._2))
    val want = scored.orderBy(col("score").desc, col("vec_id").asc).limit(rerank)
      .select("vec_id", "score", "tag").collect().map(key).sortBy(x => (x._1, x._2))
    assert(got.length === rerank)
    assert(got.toSeq === want.toSeq)
  }

  test("invalid configurations are rejected") {
    intercept[IllegalArgumentException] {
      ProductQuantization.trainCodebooks(
        corpus, "vec_id", "embedding", dim = dim, m = 7, k = 4, iters = 0)
    }
    intercept[IllegalArgumentException] {
      ProductQuantization.pqTopK(
        corpus, "vec_id", "embedding",
        corpus.limit(1).select(col("embedding").as("qvec")),
        dim = dim, rerank = 5, topK = 10)
    }
  }
}
