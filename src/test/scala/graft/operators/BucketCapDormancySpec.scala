package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental dedup gates (dd_minhash_incremental,
  * dd_simhash_incremental, dd_embedding_incremental) share DuckDB
  * oracles that do NOT model the default-on corpus-side bucket cap —
  * the cross-engine hashes agree only while the cap is DORMANT on the
  * fixture (every bucket under the cap ⇒ the capped index is
  * bit-identical to the uncapped one). This spec asserts that dormancy
  * directly, at both scales an oracle gate runs at (sf0.001 locally,
  * sf0.01 in the driver): the max per-(band,bkey)/bucket occupancy of
  * each gated corpus index stays below its cap with ≥4× headroom. A
  * testdata regeneration that lands a hot bucket fails HERE, loudly,
  * as a fixture problem — not as an inscrutable oracle hash mismatch
  * three layers away. */
class BucketCapDormancySpec extends SparkSpecBase {

  private val gateDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(d).isDirectory)

  /** Corpus split convention shared by all three incremental gates:
    * id % 5 != 0 is the standing corpus the index is built over. */
  private def corpusDocs(dir: String): DataFrame =
    Tables.documents(spark, dir).filter(pmod(col("doc_id"), lit(5)) =!= 0)

  private def maxOccupancy(banded: DataFrame, keys: Seq[String]): Long =
    banded.groupBy(keys.map(col): _*).count()
      .agg(max("count")).collect().head.getLong(0)

  test("minhash band-bucket occupancy on the gated fixtures is far below DefaultMaxBucket") {
    gateDirs.foreach { dir =>
      val occ = maxOccupancy(
        Dedup.minhashBanded(corpusDocs(dir), "doc_id", "text"),
        Seq("band", "bkey"))
      assert(occ * 4 <= Dedup.DefaultMaxBucket,
        s"$dir: max minhash (band,bkey) occupancy $occ is within 4x of the " +
          s"cap ${Dedup.DefaultMaxBucket} — the dd_minhash_incremental oracle " +
          "does not model the cap; regenerate the fixture or cap-model the oracle")
    }
  }

  test("simhash band-bucket occupancy on the gated fixtures is far below DefaultMaxBucket") {
    // load-bearing family: an r-bit simhash band key has <= 2^r values
    // (256 at the 64/8 default), so occupancy grows ~n/256 with corpus
    // size — this is the first cap a bigger fixture would hit
    gateDirs.foreach { dir =>
      val occ = maxOccupancy(
        Dedup.simhashBanded(corpusDocs(dir), "doc_id", "text"),
        Seq("band", "bkey"))
      assert(occ * 4 <= Dedup.DefaultMaxBucket,
        s"$dir: max simhash (band,bkey) occupancy $occ is within 4x of the " +
          s"cap ${Dedup.DefaultMaxBucket} — the dd_simhash_incremental oracle " +
          "does not model the cap")
    }
  }

  test("embedding LSH bucket occupancy on the gated fixtures is far below DefaultMaxBucketOccupancy") {
    gateDirs.foreach { dir =>
      val corpus = Tables.embeddings(spark, dir)
        .filter(pmod(col("vec_id"), lit(5)) =!= 0)
      // nBits = 4 pins the gated posture (dd_embedding_incremental's
      // EmbNBits), not the corpus-scaled default
      val occ = maxOccupancy(
        SimilaritySearch.lshBuckets(corpus, "vec_id", "embedding",
          dim = 64, nBits = 4),
        Seq("bucket"))
      assert(occ * 4 <= SimilaritySearch.DefaultMaxBucketOccupancy,
        s"$dir: max LSH bucket occupancy $occ is within 4x of the cap " +
          s"${SimilaritySearch.DefaultMaxBucketOccupancy} — the " +
          "dd_embedding_incremental oracle does not model the cap")
    }
  }
}
