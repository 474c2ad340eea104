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

  /** Distinct word n-gram shingles of `text` (the dedup unit). Built as
    * a single projection expression: stays inside whole-stage codegen,
    * no explode/shuffle. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    val idx = sequence(lit(0), greatest(size(t) - n, lit(-1)))
    array_distinct(transform(idx, i =>
      concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*)))
  }

  /** MinHash signature: `k` independent min-hashes over `shingleArr`.
    * Each component i is min over shingles of xxhash64(shingle, i) — all
    * nested higher-order functions in one projection, so the signature
    * of a document costs zero shuffles. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingleArr, s => xxhash64(s, i))))

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
    transform(sequence(lit(0), lit(bits - 1)), j =>
      when(
        aggregate(tokenArr, lit(0L), (acc, t) =>
          acc + when(pmod(xxhash64(t, j), lit(2L)) === 0, 1L).otherwise(-1L))
          > 0, 1).otherwise(0))

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(bitsA: Column, bitsB: Column): Column =
    aggregate(zip_with(bitsA, bitsB, (a, b) => when(a =!= b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
