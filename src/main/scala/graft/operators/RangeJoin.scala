package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval (range) join — the second join shape
  * Spark lacks natively (next to AsOfJoin): `point BETWEEN start AND
  * end` with NO equi key. Spark's only built-in plan for a pure range
  * predicate is BroadcastNestedLoopJoin — O(|P|·|I|) comparisons and a
  * broadcast that falls over at scale.
  *
  * Plan here: quantize the domain into width-w buckets; each interval
  * explodes into the buckets it overlaps (len/w + 1 rows), each point
  * joins its single bucket by EQUALITY, and the exact BETWEEN runs as a
  * residual filter on the equi-matches. Shuffle volume is
  * |I|·(len/w + 1) + |P| rows — linear, hash-partitioned, AQE-skew-
  * splittable — and a (point,interval) pair can match in at most one
  * bucket (the point's), so no dedup pass is needed. `bucketWidth`
  * trades fan-out for candidate precision; set it near the typical
  * interval length.
  */
object RangeJoin {

  /** Inner point-in-interval join over numeric (long) domain columns:
    * returns point rows joined with every interval row whose
    * [startCol, endCol] contains the point. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points
      .withColumn("__b", floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__b", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(i, Seq("__b"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}
