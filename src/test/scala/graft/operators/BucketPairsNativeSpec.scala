package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

/** Differential gate for the round-18 NATIVE pair walks
  * (plans.PackedBucketPairs / plans.JaccardBucketPairs): the compiled
  * walk must reproduce the HOF walk's pairs BIT-FOR-BIT — same
  * first-colliding-band dedup, same hot-bucket survivor+chain branch,
  * same least/greatest direction, same scores — across dormant AND
  * engaged cap regimes. The HOF reference is the SAME code path every
  * pre-round-18 gate ran: `packedBucketPairs`/`bucketPairs` fall back to
  * it whenever the doc column is not a long, so widening doc to
  * decimal(18,0) (numeric order identical to long) drives the identical
  * query through the old walk. */
class BucketPairsNativeSpec extends SparkSpecBase {

  /** Random packed-signature corpus with planted near-duplicate
    * clusters (low-Hamming neighbors force multi-band collisions, so
    * the first-colliding-band dedup is exercised, not just band 0). */
  private def packedSigs(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val base = rnd.nextLong() & ((1L << 63) - 1)
      val sig =
        if (i % 3 == 0 && i > 0) {
          // near-dup of a previous row: flip 0-9 random bits
          val prev = (i - 1).toLong
          var s = prevSig.getOrElse(prev, base)
          val flips = rnd.nextInt(10)
          (0 until flips).foreach(_ => s ^= (1L << rnd.nextInt(63)))
          s
        } else base
      prevSig(i.toLong) = sig
      (i.toLong, sig)
    }
    spark.createDataFrame(rows).toDF("doc", "sig")
  }
  private val prevSig = scala.collection.mutable.Map.empty[Long, Long]

  private def collectPairs(df: DataFrame): Set[(Long, Long, Any)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet

  private def packedBoth(sigs: DataFrame, bits: Int, bands: Int,
      cap: Option[Int]): (Set[(Long, Long, Any)], Set[(Long, Long, Any)]) = {
    val native = Dedup.packedSignaturePairs(sigs, "doc", "sig", bits, bands, cap)
    // decimal doc → the HOF fallback walk (numeric least/greatest order
    // identical to long, so pairs and direction match)
    val hof = Dedup.packedSignaturePairs(
      sigs.select(col("doc").cast("decimal(18,0)").as("doc"), col("sig")),
      "doc", "sig", bits, bands, cap)
    (collectPairs(native), collectPairs(hof))
  }

  test("native packed walk == HOF walk (dormant cap, several band cuts)") {
    val sigs = packedSigs(400, seed = 18L)
    for (bands <- Seq(9, 7, 3)) {
      val (n, h) = packedBoth(sigs, 63, bands, Some(Dedup.DefaultMaxBucket))
      assert(n === h, s"bands=$bands dormant-cap mismatch")
      assert(n.nonEmpty, s"bands=$bands walk found no pairs — vacuous test")
    }
  }

  test("native packed walk == HOF walk (ENGAGED cap: survivor pairs + chains)") {
    val sigs = packedSigs(400, seed = 19L)
    for (cap <- Seq(2, 5, 16)) {
      val (n, h) = packedBoth(sigs, 63, 9, Some(cap))
      assert(n === h, s"cap=$cap engaged-cap mismatch")
      assert(n.nonEmpty, s"cap=$cap walk found no pairs — vacuous test")
    }
  }

  test("native packed walk == HOF walk (uncapped, the dd_phash oracle posture)") {
    val sigs = packedSigs(300, seed = 20L)
    val (n, h) = packedBoth(sigs, 63, 9, None)
    assert(n === h)
    assert(n.nonEmpty)
  }

  test("native packed maxScore pushdown == post-filter") {
    val sigs = packedSigs(300, seed = 21L)
    val pushed = collectPairs(Dedup.packedSignaturePairs(
      sigs, "doc", "sig", 63, 9, Some(8), maxScore = Some(8)))
    val post = collectPairs(Dedup.packedSignaturePairs(
      sigs, "doc", "sig", 63, 9, Some(8)).filter(col("score") <= 8))
    assert(pushed === post)
    assert(pushed.nonEmpty, "no pairs within Hamming 8 — vacuous test")
  }

  test("native jaccard walk == HOF walk on the real corpus (dormant + engaged caps)") {
    val docs = Tables.documents(spark, sfDir)
    for (cap <- Seq(Some(Dedup.DefaultMaxBucket), Some(2), Some(4))) {
      val native = Dedup.minhashPairs(docs, "doc_id", "text", maxBucket = cap)
      val hof = Dedup.minhashPairs(
        docs.select(col("doc_id").cast("decimal(18,0)").as("doc_id"), col("text")),
        "doc_id", "text", maxBucket = cap)
      def canon(df: DataFrame) = df.select(
        col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("est_jaccard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(canon(native) === canon(hof), s"cap=$cap jaccard mismatch")
      assert(canon(native).nonEmpty, s"cap=$cap found no pairs — vacuous test")
    }
  }

  test("gate shapes still produce pairs end-to-end (phash native walk)") {
    val media = Multimodal.syntheticImagesFromText(
      Tables.documents(spark, sfDir).filter(pmod(col("doc_id"), lit(3)) === 0),
      "doc_id", "text")
    val pairs = PerceptualHash.phashPairs(media, maxBucket = None).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= PerceptualHash.DefaultMaxHamming))
  }
}
