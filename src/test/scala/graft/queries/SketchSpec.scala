package graft.queries

import graft.SparkSpecBase

class SketchSpec extends SparkSpecBase {

  test("approximate sketches stay within error bounds of exact answers") {
    val rows = TrainingDataQueries.skSketches(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"${r.getString(0)}: approx=$approx exact=$exact")
      val p50 = r.getAs[Double]("p50_value")
      val p99 = r.getAs[Double]("p99_value")
      assert(p50 <= p99)
    }
  }
}
