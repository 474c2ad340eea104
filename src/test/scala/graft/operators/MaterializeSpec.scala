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

  test("disk + eager cuts Catalyst lineage (loop plans must not nest)") {
    import spark.implicits._
    spark.conf.set(Materialize.ConfKey, "disk")
    try {
      // simulate a round loop: each iteration derives from the last pin;
      // with lineage kept the analyzed plan depth grows per round
      var df = Seq(1L, 2L, 3L).toDF("x")
      for (_ <- 1 to 5)
        df = Materialize.stage(df.withColumn("x", col("x") + 1), eager = true)
      assert(df.collect().map(_.getLong(0)).sorted === Array(6L, 7L, 8L))
      // the staged frame's plan must be a flat scan (LogicalRDD), not a
      // 5-deep Project chain over persisted children
      val planStr = df.queryExecution.analyzed.toString
      assert(planStr.contains("LogicalRDD"),
        s"expected lineage-cut LogicalRDD root, got:\n$planStr")
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("staged() release drops the disk pin; round loops cannot accumulate pins") {
    import spark.implicits._
    spark.conf.set(Materialize.ConfKey, "disk")
    try {
      // lazy posture: the handle IS the persisted frame — release must
      // clear its storage registration (round-16 ADVICE: without the
      // handle, a loop's DISK_ONLY_2 pins live for the app lifetime)
      val (p, release) = Materialize.staged(Seq(1L, 2L).toDF("x"))
      p.count()
      assert(p.storageLevel.useDisk, "expected a DISK_ONLY_2 pin")
      release()
      assert(p.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "release() must unpersist the pin")
      // eager posture (the round-loop form): the pin is hidden behind
      // the LogicalRDD re-root, so count persistent RDDs across a
      // simulated loop that releases each superseded round — the
      // steady-state pin count must not grow with iterations
      def pinned(): Int = spark.sparkContext.getPersistentRDDs.size
      val before = pinned()
      var (df, rel) = Materialize.staged(Seq(1L, 2L, 3L).toDF("x"), eager = true)
      for (_ <- 1 to 5) {
        val (next, relNext) =
          Materialize.staged(df.withColumn("x", col("x") + 1), eager = true)
        rel(); df = next; rel = relNext
      }
      assert(df.collect().map(_.getLong(0)).sorted === Array(6L, 7L, 8L))
      assert(pinned() <= before + 1,
        s"pins grew with loop rounds: $before -> ${pinned()}")
      rel()
    } finally spark.conf.unset(Materialize.ConfKey)
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
