package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A built Bloom filter: the bit words plus the probe count `k` used to
  * build them. Bundled in one value so build and probe can never
  * diverge — probing with a larger `k` than the build used would yield
  * FALSE NEGATIVES (silently dropped join rows), which is the one
  * failure mode a Bloom filter must never have. `m` is implied:
  * `bits.length * 64`.
  */
final case class BloomFilter(bits: Array[Long], k: Int) {
  require(k >= 1, s"k must be >= 1, got $k")
  require(bits.nonEmpty, "bits must be non-empty")
  def mBits: Long = bits.length * 64L

  /** Membership probe as a pure Column: true iff all k probe bits of
    * `key` are set. NULL key → NULL explicitly (three-valued logic, the
    * same answer an equi-join membership test gives): the key is gated
    * through `when(key.isNull, null)` because Spark's `xxhash64` is
    * NON-nullable — it silently skips NULL children, so an unguarded
    * probe of NULL would hash the seed literals alone and return a real
    * (meaningless) boolean. All built-ins — stays in whole-stage
    * codegen. */
  def mightContain(key: Column): Column = {
    val m = mBits
    val bitsLit = lit(bits)
    val probe = (0 until k).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(m))
      val word = element_at(bitsLit, (p / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), (p % 64).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
    when(key.isNull, lit(null).cast("boolean")).otherwise(probe)
  }

  /** Just the pruned fact side — for callers composing their own join
    * (or reusing one persisted filter across many queries). NULL-key
    * rows are dropped (mightContain(NULL) is NULL and filters drop
    * NULL), matching inner-equi-join semantics; callers composing an
    * OUTER join must re-union the NULL-key rows themselves. */
  def prunedFact(fact: DataFrame, factKey: String): DataFrame =
    fact.filter(mightContain(col(factKey)))
}

/** Bloom-filter semi-join reduction — the classic shuffle-reduction
  * technique for a selective join at cluster scale: a 100 TB fact side
  * joined to a dimension subset touching 1% of its keys still shuffles
  * ALL 100 TB under a plain shuffle join, because Spark only knows the
  * join is selective after the probe. A Bloom filter of the dimension
  * keys — kilobytes for millions of keys — rides into the fact scan as
  * a plan-literal filter and drops non-matching rows BEFORE the
  * exchange, shrinking the shuffle to matches + the false-positive
  * residue (≤ (1-e^{-kn/m})^k of the rest, ~1% at the defaults here).
  *
  * Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
  * opportunistically for some plan shapes; this operator makes it an
  * explicit, deterministic, composable building block: the filter is an
  * `Array[Long]` of plain bits, buildable once and reusable across
  * queries / batches (the persisted-index pattern of the dedup family
  * applies — the bitset is just columns of longs).
  *
  * Exactness contract: a Bloom filter has NO false negatives, so
  * `bloomPrunedJoin` ≡ the plain join row-for-row — which is exactly
  * what the op_bloom_join gate proves against DuckDB's un-pruned join.
  * False positives cost only wasted shuffle bytes; the equi-join
  * eliminates them.
  *
  * NULL semantics (explicit, because Spark's xxhash64 IGNORES null
  * children rather than returning null): build drops NULL keys before
  * hashing, probe gates NULL keys to NULL before hashing. Net effect:
  * NULL never sets a bit and never passes a filter — the equi-join
  * answer.
  *
  * Determinism: probe positions are `xxhash64(key, probe_i) mod m` —
  * Spark-side-only arithmetic (the oracle never hashes; it runs the
  * un-pruned join), fixed seed, no RNG state, so the filter bits are a
  * pure function of the key set and (m, k).
  *
  * Scale shape: the build is one scan of the dimension keys → k
  * exploded positions → a `bit_or` aggregation over ≤ m/64 word groups
  * — the ONLY driver collect is those ≤ m/64 = 1024 masked longs at the
  * default m = 2^16 (bounded model state, like centroids/codebooks).
  * The probe is a pure projection: k codegen'd hash-and-bit-tests
  * against an array literal, inside whole-stage codegen, no join, no
  * broadcast variable plumbing.
  */
object BloomJoin {

  /** Build a filter over `keys[keyCol]` (need not be distinct —
    * duplicates OR into the same bits). `mBits` must be a multiple of
    * 64; sizing rule of thumb: m ≈ 10·n_distinct_keys bits gives ~1%
    * false positives at k = 4. NULL keys are dropped BEFORE hashing
    * (xxhash64 would otherwise hash the seed alone and set k real
    * bits for them) — NULL sets no bits, matching equi-join
    * never-matches-NULL semantics. */
  def build(keys: DataFrame, keyCol: String, mBits: Int = 1 << 16,
      k: Int = 4): BloomFilter = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val pos = (0 until k).map(i => pmod(xxhash64(col(keyCol), lit(i)), lit(mBits.toLong)))
    val words = keys
      .where(col(keyCol).isNotNull)
      .select(explode(array(pos: _*)).as("p"))
      .select((col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("m"))
      .groupBy("w")
      .agg(bit_or(col("m")).as("mask"))
      .collect() // bounded: ≤ mBits/64 rows of (int, long)
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    BloomFilter(bits, k)
  }

  /** The composed rewrite: filter `fact` through a Bloom filter of
    * `dim[dimKey]`'s distinct keys, then inner-join on
    * fact[factKey] = dim[dimKey]. Row-for-row equal to the plain join;
    * the fact side shuffles (or probes the broadcast) only for rows
    * passing the filter. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      mBits: Int = 1 << 16, k: Int = 4): DataFrame = {
    val filter = build(dim.select(col(dimKey)).distinct(), dimKey, mBits, k)
    filter.prunedFact(fact, factKey)
      .join(dim, col(factKey) === dim(dimKey))
  }
}
