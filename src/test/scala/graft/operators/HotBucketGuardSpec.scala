package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

/** The hot-bucket occupancy guard: real corpora land boilerplate
  * near-dup clusters and dense semantic clusters in single LSH
  * buckets / IVF cells, where the unguarded per-bucket pairwise
  * expansion is O(m²) structs inside one aggregation row — the
  * executor-OOM class at 100 TB. These specs plant an adversarial
  * cluster (≥20% of the corpus near-identical), force a tiny cap so
  * the guard activates at fixture scale, and assert the two contract
  * halves: bounded per-bucket work (candidate volume O(cap² + m), not
  * O(m²)) and preserved semantics (identical duplicate CLUSTERS via
  * representative chaining; deterministic, high-quality ANN neighbors
  * from the key-stable pool). Dormancy is asserted too: at fixture
  * occupancies the default caps must leave results bit-identical to
  * the unguarded plan, which is what keeps every cross-engine gate
  * green. */
class HotBucketGuardSpec extends SparkSpecBase {

  import spark.implicits._

  /** 200 docs, 50 of them (25%) near-identical: one shared 39-token
    * base with a single distinct token appended (shingle Jaccard ≈ 0.9,
    * est-Jaccard safely above the 0.5 default threshold for every
    * pair). The rest are unique random-token docs. */
  private lazy val hotDocs = {
    val rnd = new scala.util.Random(0x407)
    val base = (1 to 39).map(i => s"w${i * 7 % 97}").mkString(" ")
    val cluster = (0L until 50L).map(i => (i, s"$base unique$i"))
    val rest = (50L until 200L).map { i =>
      (i, (1 to 30).map(_ => s"r${rnd.nextInt(5000)}x$i").mkString(" "))
    }
    (cluster ++ rest).toDF("doc_id", "text")
  }

  private def clustersOf(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("minhash guard: capped hot bucket resolves the SAME duplicate clusters with O(cap²+m) pairs") {
    val exact = Dedup.minhashPairs(hotDocs, "doc_id", "text", maxBucket = None)
    val guarded = Dedup.minhashPairs(hotDocs, "doc_id", "text", maxBucket = Some(8))
    val exactPairs = exact.collect()
    val guardedPairs = guarded.collect()
    // the adversarial cluster really is hot: the exact pair set is
    // quadratic in the cluster (50·49/2), the guarded one is bounded by
    // survivor pairs + chains (8·7/2 + 42 = 70)
    assert(exactPairs.length === 50 * 49 / 2, "exact path enumerates the full cluster")
    assert(guardedPairs.length <= 100,
      s"guard must bound candidate volume, got ${guardedPairs.length}")
    // representative chaining keeps every member reachable: the
    // CLUSTER-level result (what a dedup pipeline acts on) is identical
    assert(clustersOf(guarded) === clustersOf(exact))
    // chains carry real scores: every emitted pair still clears the
    // est-Jaccard threshold
    assert(guardedPairs.forall(_.getAs[Double]("est_jaccard") >= 0.5))
  }

  test("simhash guard: same cluster contract on the Hamming path") {
    // identical texts (the boilerplate extreme): a single-token edit
    // already moves SimHash by more than the Hamming cut, so the
    // adversarial SimHash bucket is a literal copy cluster
    val rnd = new scala.util.Random(0x51)
    val base = (1 to 39).map(i => s"w${i * 7 % 97}").mkString(" ")
    val docs = ((0L until 50L).map(i => (i, base)) ++
      (50L until 200L).map(i =>
        (i, (1 to 30).map(_ => s"r${rnd.nextInt(5000)}x$i").mkString(" "))))
      .toDF("doc_id", "text")
    val exact = Dedup.simhashPairs(docs, "doc_id", "text", maxBucket = None)
    val guarded = Dedup.simhashPairs(docs, "doc_id", "text", maxBucket = Some(8))
    assert(exact.count() === 50L * 49 / 2)
    assert(guarded.count() <= 100)
    assert(clustersOf(guarded) === clustersOf(exact))
  }

  test("guard dormancy: default caps leave fixture results bit-identical to the unguarded plan") {
    val docs = Tables.documents(spark, sfDir)
    val mhG = Dedup.minhashPairs(docs, "doc_id", "text").collect().toSet
    val mhE = Dedup.minhashPairs(docs, "doc_id", "text", maxBucket = None).collect().toSet
    assert(mhG === mhE)
    val emb = Tables.embeddings(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e12))
    val lshG = SimilaritySearch.lshNeighbors(emb, "vec_id", "embedding",
      dim = 64, nBits = 4, k = 3, nTables = 2).collect().map(key).toSet
    val lshE = SimilaritySearch.lshNeighbors(emb, "vec_id", "embedding",
      dim = 64, nBits = 4, k = 3, nTables = 2, maxBucket = None).collect().map(key).toSet
    assert(lshG === lshE)
    val ivfG = SimilaritySearch.ivfNeighbors(emb, "vec_id", "embedding",
      dim = 64, nCentroids = 8, nProbe = 2, k = 3).collect().map(key).toSet
    val ivfE = SimilaritySearch.ivfNeighbors(emb, "vec_id", "embedding",
      dim = 64, nCentroids = 8, nProbe = 2, k = 3, maxBucket = None).collect().map(key).toSet
    assert(ivfG === ivfE)
  }

  /** 300 vectors, 100 of them (33%) a tight cluster around one random
    * direction (cos ≈ 0.999 pairwise) — one LSH bucket / IVF cell at
    * any banding. */
  private lazy val hotVecs = {
    val rnd = new scala.util.Random(0xC1)
    val dim = 8
    val base = Array.fill(dim)(rnd.nextGaussian())
    def jitter() = base.map(_ + rnd.nextGaussian() * 0.01)
    val cluster = (0L until 100L).map(i => (i, jitter().toSeq))
    val rest = (100L until 300L).map(i => (i, Array.fill(dim)(rnd.nextGaussian()).toSeq))
    (cluster ++ rest).toDF("vec_id", "embedding")
  }

  test("lsh guard: hot bucket answers from the key-stable pool — deterministic, bounded, still in-cluster") {
    def run() = SimilaritySearch.lshNeighbors(hotVecs, "vec_id", "embedding",
      dim = 8, nBits = 3, k = 3, nTables = 2, maxBucket = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val a = run()
    // key-stable pool ⇒ bit-deterministic across runs
    assert(a.toSet === run().toSet)
    // every cluster member still finds near-duplicate-grade neighbors
    // (top-3 of an 8-member sample of its own tight cluster)
    val byVec = a.groupBy(_._1)
    for (v <- 0L until 100L) {
      val mine = byVec.getOrElse(v, Array.empty)
      assert(mine.nonEmpty, s"cluster member $v lost all neighbors under the guard")
      assert(mine.forall(_._3 > 0.99),
        s"cluster member $v got out-of-cluster neighbors: ${mine.mkString(",")}")
    }
  }

  test("ivf guard: hot cell answers from the key-stable member pool") {
    def run() = SimilaritySearch.ivfNeighbors(hotVecs, "vec_id", "embedding",
      dim = 8, nCentroids = 6, nProbe = 2, k = 3, maxBucket = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val a = run()
    assert(a.toSet === run().toSet)
    val byVec = a.groupBy(_._1)
    for (v <- 0L until 100L) {
      val mine = byVec.getOrElse(v, Array.empty)
      assert(mine.nonEmpty, s"cluster member $v lost all neighbors under the guard")
      assert(mine.forall(_._3 > 0.99),
        s"cluster member $v got out-of-cluster neighbors")
    }
  }

  test("occupancy observability reports the planted skew regime") {
    val stats = Occupancy.stats(
      Dedup.minhashBanded(hotDocs, "doc_id", "text"), 8L, "band", "bkey")
      .collect().head
    // the 50-member cluster shares all 16 band buckets → max occupancy
    // 50 and at least 16 buckets over the cap
    assert(stats.getAs[Long]("max_occ") === 50L)
    assert(stats.getAs[Long]("n_over") >= 16L)
    val lshStats = Occupancy.stats(
      SimilaritySearch.lshBuckets(hotVecs, "vec_id", "embedding", dim = 8, nBits = 3),
      8L, "bucket").collect().head
    assert(lshStats.getAs[Long]("max_occ") >= 100L,
      "the tight cluster must land in one LSH bucket")
  }
}
