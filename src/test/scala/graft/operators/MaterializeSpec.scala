package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The `spark.graft.materialize` knob moves WHERE a mid-plan pin's
  * bytes live (executor storage / replicated disk / checkpoint dir) —
  * never the bytes: a representative pin-heavy operator must produce
  * identical rows under all three postures, and the pinned frame must
  * stay consumable by multiple downstream readers in each. */
class MaterializeSpec extends SparkSpecBase {

  private def spans() =
    Dedup.sharedSpans(graft.sources.Tables.documents(spark, sfDir), "doc_id", "text")
      .orderBy("doc_a", "doc_b").collect().toSeq

  test("local/disk/reliable postures are result-identical on a pin-heavy operator") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mat-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val base = spans() // default = local
    for (mode <- Seq("disk", "reliable")) {
      spark.conf.set(Materialize.ConfKey, mode)
      try assert(spans() === base, s"posture $mode diverged")
      finally spark.conf.unset(Materialize.ConfKey)
    }
  }

  test("stage() honors eager flag and unknown modes fall back to local") {
    import spark.implicits._
    spark.conf.set(Materialize.ConfKey, "definitely-not-a-mode")
    try {
      val df = Seq(1, 2, 3).toDF("x")
      val staged = Materialize.stage(df, eager = true)
      assert(staged.collect().map(_.getInt(0)).sorted === Array(1, 2, 3))
    } finally spark.conf.unset(Materialize.ConfKey)
  }
}
