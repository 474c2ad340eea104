package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float|double>` columns, written
  * as higher-order-function expressions (codegen'd, deterministic
  * left-to-right accumulation — important for oracle parity and for
  * reproducibility across partitionings at scale).
  */
object VectorFunctions {

  /** Cast to array<double> — do float→double widening once, up front. */
  def asDoubles(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket id for a vector: `nBits` sign bits,
    * hyperplane components derived deterministically from xxhash64 so
    * every executor computes identical planes with no broadcast state.
    * Component j of plane h = (xxhash64(h, j) mod 2001)/1000 - 1 ∈ [-1,1].
    */
  def hyperplaneBits(v: Column, nBits: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(nBits - 1)), h => {
      val proj = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0), (acc, j) =>
        acc + element_at(v, j + 1) *
          ((pmod(xxhash64(h, j), lit(2001L)).cast("double") / 1000.0) - 1.0))
      when(proj > 0, 1).otherwise(0)
    })
}
