package graft.store

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Snapshot-manifest commits: multi-frame atomicity through the single
  * pointer PUT, empty-but-typed cold reads, orphan tolerance, vacuum
  * retention. */
class SnapshotSpec extends SparkSpecBase {

  import spark.implicits._

  private val schemaA = StructType(Seq(StructField("x", LongType)))
  private val schemaB = StructType(Seq(StructField("y", StringType)))

  test("commit publishes all frames together; cold reads are empty-but-typed") {
    val base = Files.createTempDirectory("snap").toString
    assert(Snapshot.read(spark, base, "a", schemaA).collect().isEmpty)
    assert(Snapshot.currentVersion(spark, base).isEmpty)
    val v0 = Snapshot.commit(spark, base, Map(
      "a" -> Seq(1L, 2L).toDF("x"),
      "b" -> Seq("p").toDF("y")))
    assert(v0 === 0L)
    assert(Snapshot.read(spark, base, "a", schemaA)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(Snapshot.read(spark, base, "b", schemaB)
      .collect().map(_.getString(0)).toSeq === Seq("p"))
  }

  test("an UNPUBLISHED version is invisible: readers stay on the committed snapshot") {
    val base = Files.createTempDirectory("snap-torn").toString
    Snapshot.commit(spark, base, Map("a" -> Seq(1L).toDF("x")))
    // simulate a crash mid-commit: v1 data written, pointer never moved
    Seq(99L).toDF("x").write.parquet(s"$base/v1/a")
    assert(Snapshot.currentVersion(spark, base) === Some(0L))
    assert(Snapshot.read(spark, base, "a", schemaA)
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // the next real commit claims a FRESH version past the orphan? No:
    // versions derive from the pointer, so v1 is REUSED — overwritten
    // whole by the writer (single-writer contract) before the pointer
    // moves, which is exactly the recovery semantics the survivor
    // pipeline's refold relies on
    val v1 = Snapshot.commit(spark, base, Map("a" -> Seq(7L).toDF("x")))
    assert(v1 === 1L)
    assert(Snapshot.read(spark, base, "a", schemaA)
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("vacuum keeps the newest versions and never the current one") {
    val base = Files.createTempDirectory("snap-vac").toString
    (0 until 4).foreach { i =>
      Snapshot.commit(spark, base, Map("a" -> Seq(i.toLong).toDF("x")))
    }
    Snapshot.vacuum(spark, base, keep = 2)
    val dirs = new java.io.File(base).listFiles().map(_.getName).toSet
    assert(dirs.contains("v3") && dirs.contains("v2"))
    assert(!dirs.contains("v0") && !dirs.contains("v1"), s"got $dirs")
    assert(Snapshot.read(spark, base, "a", schemaA)
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
