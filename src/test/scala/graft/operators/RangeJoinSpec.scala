package graft.operators

import graft.SparkSpecBase

class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  test("point-in-interval: inclusive boundaries, bucket-crossing intervals, no duplicates") {
    val points = Seq((1L, 0L), (2L, 16L), (3L, 17L), (4L, 100L), (5L, -5L))
      .toDF("pid", "p")
    val intervals = Seq(
      (10L, 0L, 16L), // spans buckets 0 and 1 (width 16): matches p=0 and p=16
      (11L, 17L, 17L), // degenerate single-point interval
      (12L, -8L, -1L), // negative domain
      (13L, 50L, 40L)) // inverted → dropped
      .toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 16)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly one row per true containment, including both inclusive ends
    assert(out.toSet === Set((1L, 10L), (2L, 10L), (3L, 11L), (5L, 12L)))
    assert(out.length === out.toSet.size, "bucketization must not duplicate matches")
  }
}
