package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

/** BloomJoin: exactness of the pruned join vs the plain join, actual
  * pruning selectivity (an always-true mightContain would still pass
  * the op_bloom_join oracle gate — this spec is the guard), and the
  * explicit NULL semantics (Spark's xxhash64 ignores NULL children, so
  * both sides gate NULLs by hand). */
class BloomJoinSpec extends SparkSpecBase {

  private def dim = Tables.part(spark, sfDir)
    .filter(col("p_size") === 1)
    .select(col("p_partkey"), col("p_brand"))

  private def fact = Tables.lineitem(spark, sfDir)
    .select(col("l_partkey"), col("l_quantity"))

  test("bloomPrunedJoin is row-for-row equal to the plain join") {
    val pruned = BloomJoin.bloomPrunedJoin(fact, dim, "l_partkey", "p_partkey")
      .select(col("l_partkey"), col("l_quantity"), col("p_brand"))
    val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("p_brand"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the filter actually prunes: passes ≪ corpus, and ⊇ true matches") {
    val filter = BloomJoin.build(dim.select("p_partkey").distinct(), "p_partkey")
    val total = fact.count()
    val passed = filter.prunedFact(fact, "l_partkey").count()
    val trueMatches = fact.join(dim.select("p_partkey").distinct(),
      col("l_partkey") === col("p_partkey"), "left_semi").count()
    // no false negatives, and the false-positive residue is small: at
    // m=2^16, k=4 over ~20 dim keys the fp rate is ~0, so passes should
    // be within 10% of the true match count and far below the corpus
    assert(passed >= trueMatches, s"false negatives: $passed < $trueMatches")
    assert(passed <= trueMatches + math.max(10L, total / 10),
      s"filter barely prunes: $passed passed of $total (true: $trueMatches)")
    assert(passed < total / 2, s"filter passes most of the corpus: $passed / $total")
  }

  test("NULL keys: set no bits on build, probe to NULL, never pass a filter") {
    import spark.implicits._
    val keysWithNull = Seq(Some(1L), Some(2L), None).toDF("k")
    val filter = BloomJoin.build(keysWithNull, "k", mBits = 1 << 10, k = 4)
    val emptyFilter = BloomJoin.build(
      keysWithNull.filter(col("k").isNotNull).filter(col("k") < 0), "k",
      mBits = 1 << 10, k = 4)
    // all-NULL build sets zero bits (an unguarded xxhash64 build would
    // set k bits for the NULL rows)
    val nullOnly = BloomJoin.build(keysWithNull.filter(col("k").isNull), "k",
      mBits = 1 << 10, k = 4)
    assert(nullOnly.bits.forall(_ == 0L), "NULL keys set bits on build")
    assert(emptyFilter.bits.forall(_ == 0L))
    // probe of a NULL key is NULL (three-valued), not a real boolean
    val probed = Seq(Some(1L), Some(999L), None).toDF("k")
      .select(col("k"), filter.mightContain(col("k")).as("hit"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(probed(1L) == true, "member key must hit")
    assert(probed(null) == null, "NULL key must probe to NULL, not a boolean")
    // and a filter therefore drops the NULL-key row
    val kept = probed.keySet
    val passed = Seq(Some(1L), None).toDF("k")
      .filter(filter.mightContain(col("k"))).collect()
    assert(passed.length == 1 && passed.head.getLong(0) == 1L)
    assert(kept.contains(1L))
  }

  test("build and probe k cannot diverge: bundled in the BloomFilter") {
    // the type system is the guard — this test documents the contract:
    // a BloomFilter probes with exactly the k it was built with
    val filter = BloomJoin.build(dim.select("p_partkey").distinct(),
      "p_partkey", mBits = 1 << 12, k = 7)
    assert(filter.k == 7 && filter.mBits == (1 << 12))
  }
}
