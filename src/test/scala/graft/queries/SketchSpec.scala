package graft.queries

import graft.SparkSpecBase

class SketchSpec extends SparkSpecBase {

  test("approximate sketches stay within error bounds of exact answers") {
    val rows = TrainingDataQueries.skSketches(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") > 0)
      assert(r.getAs[Long]("exact_users") > 0)
      // the within-bound booleans ARE the sketch-error assertions now —
      // and the same booleans gate the DuckDB hash compare (the oracle
      // emits literal TRUEs), so a bound violation fails both CI and the
      // driver's correctness gate
      assert(r.getAs[Boolean]("approx_users_ok"), r.toString)
      assert(r.getAs[Boolean]("p50_ok"), r.toString)
      assert(r.getAs[Boolean]("p99_ok"), r.toString)
    }
  }
}
