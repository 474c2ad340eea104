package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators, built
  * entirely from codegen'd Spark built-ins (no UDFs — SURVEY.md §2.F
  * notes the reference needs zero UDFs; we keep that property even for
  * the ops we add beyond the reference).
  */
object TextFunctions {

  /** Whitespace tokens of `text`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles from a *materialized* token-array
    * column. The token array MUST come from its own projection (see
    * `Dedup`): this expression references it n+1 times, which keeps
    * CollapseProject from inlining the split() into the lambda —
    * interpreted higher-order functions have no common-subexpression
    * elimination, so an inlined split would re-tokenize the full text
    * for every shingle element (measured 3× re-evaluation → ~4s of the
    * original 10s dd_minhash time at sf0.1). */
  def shinglesFromTokens(tok: Column, n: Int): Column = {
    val idx = sequence(lit(0), greatest(size(tok) - n, lit(-1)))
    array_distinct(transform(idx, i =>
      concat_ws(" ", (0 until n).map(k => element_at(tok, i + k + 1)): _*)))
  }

  /** MinHash signature: `k` independent min-hashes over `shingleArr`.
    * Component i is min over shingles of xxhash64(shingle, i).
    *
    * Shaped as ONE `aggregate` over the shingle array (element-wise min
    * of per-shingle hash vectors) rather than `transform(0..k-1, i =>
    * array_min(...))`: higher-order functions are interpreted (no
    * codegen/CSE), so in the transform-outside shape Catalyst's
    * CollapseProject inlines the shingle-building expression into the
    * outer lambda and it is re-evaluated k times per row — measured 64×
    * slowdown at sf0.1. With the array as the aggregate *input* it is
    * evaluated exactly once per row. Still zero shuffles. */
  def minhashSignature(shingleArr: Column, k: Int): Column = {
    // k universal-hash coefficient pairs (fixed seed → identical on every
    // executor); h_i = (a_i*h + b_i) mod p with p = 2^31-1 and h,a,b < p,
    // so products stay < 2^62 (no ANSI overflow) and the mod breaks the
    // monotonicity that would otherwise make every component pick the
    // same min shingle. One string hash per shingle instead of k.
    val P = 2147483647L // 2^31 - 1, prime
    val rnd = new scala.util.Random(0x5EED5EED)
    def draw(lo: Long): Long = ((rnd.nextLong() & Long.MaxValue) % (P - lo)) + lo
    val aLit = array(Array.fill(k)(draw(1L)).map(lit): _*)
    val bLit = array(Array.fill(k)(draw(0L)).map(lit): _*)
    aggregate(
      transform(shingleArr, s => pmod(xxhash64(s), lit(P))),
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(
        acc,
        zip_with(aLit, bLit, (a, b) => pmod(a * h + b, lit(P))),
        (x, y) => least(x, y)))
  }

  /** Estimated Jaccard from two equal-length MinHash signatures: the
    * fraction of agreeing components. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** SimHash bit vector (length `bits`) over whitespace tokens: bit j is
    * 1 iff the sum over tokens of ±1 votes is positive, where token t's
    * vote for bit j is the parity of xxhash64(t, j) — 64 independent
    * hash functions rather than 64 bits of one hash (Spark's shiftright
    * needs a literal shift; seeded re-hash is equivalent and stays a
    * pure column expression). One projection, no shuffle. */
  def simhashBits(tokenArr: Column, bits: Int): Column =
    transform(
      // one pass over tokens accumulating all `bits` vote counters —
      // same single-evaluation rationale as minhashSignature
      aggregate(
        tokenArr,
        array_repeat(lit(0L), bits),
        (acc, t) => zip_with(
          acc,
          transform(sequence(lit(0), lit(bits - 1)), j =>
            when(pmod(xxhash64(t, j), lit(2L)) === 0, 1L).otherwise(-1L)),
          (a, b) => a + b)),
      v => when(v > 0, 1).otherwise(0))

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(bitsA: Column, bitsB: Column): Column =
    aggregate(zip_with(bitsA, bitsB, (a, b) => when(a =!= b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
