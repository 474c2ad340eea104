package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, payload) pairs
  * per group with a bounded buffer — the partial-aggregation-friendly
  * alternative to `row_number().over(window) <= k`, which must shuffle
  * every row. With this Aggregator, each map task reduces its partition
  * to ≤k entries per group before the exchange, so the shuffle carries
  * k·groups rows instead of all rows — the difference between a sort
  * of 100 TB and a sort of megabytes.
  *
  * Buffer is a sorted-ascending List (head = weakest), capped at k;
  * merge is a bounded merge of two ≤k lists. Deterministic tiebreak on
  * payload keeps results reproducible across partitionings.
  *
  * Exact-duplicate inputs collapse to one buffer entry — multi-table LSH
  * feeds the same (score, payload) once per colliding plane table, and a
  * duplicate must not occupy two of the k slots.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // ascending by (score, payload), exact dups collapsed; drop the
    // weakest when over k
    val merged = (x :: buf).distinct.sortBy(identity)
    if (merged.size > k) merged.drop(merged.size - k) else merged
  }

  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    if (buf.size < k || implicitly[Ordering[(Double, Long)]].gt(x, buf.head)) insert(buf, x)
    else buf

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
    val merged = (a ++ b).distinct.sortBy(identity)
    if (merged.size > k) merged.drop(merged.size - k) else merged
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.reverse // descending: strongest first

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
