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

  test("vacuum reclaims a crashed-commit orphan ABOVE the pointer") {
    val base = Files.createTempDirectory("snap-orphan").toString
    Snapshot.commit(spark, base, Map("a" -> Seq(1L).toDF("x")))
    // crash mid-commit: v1 data landed, pointer still at 0. Without
    // the writer ever committing again, round-12 vacuum leaked this
    // forever (v1 > cur never satisfied v <= cur - keep).
    Seq(99L).toDF("x").write.parquet(s"$base/v1/a")
    Snapshot.vacuum(spark, base, keep = 2)
    val dirs = new java.io.File(base).listFiles().map(_.getName).toSet
    assert(dirs.contains("v0") && !dirs.contains("v1"), s"got $dirs")
    assert(Snapshot.read(spark, base, "a", schemaA)
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("pointer publish is staged+renamed (no torn window) and a torn pointer recovers") {
    val base = Files.createTempDirectory("snap-atomic").toString
    Snapshot.commit(spark, base, Map("a" -> Seq(1L).toDF("x")))
    Snapshot.commit(spark, base, Map("a" -> Seq(2L).toDF("x")))
    // the staging file never survives a completed publish
    assert(!new java.io.File(base, "_current.txt.tmp").exists())
    // simulate external damage / a pre-atomic writer's torn write: an
    // EMPTY pointer. currentVersion must not throw — it recovers the
    // highest version whose every frame carries _SUCCESS.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "_current.txt"), Array.emptyByteArray)
    assert(Snapshot.currentVersion(spark, base) === Some(1L))
    assert(Snapshot.read(spark, base, "a", schemaA)
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    // an INCOMPLETE higher version (no _SUCCESS) is not a recovery
    // target: recovery resolves fully-written snapshots only
    new java.io.File(s"$base/v2/a").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, s"v2/a/part-zzz.parquet"),
      Array[Byte](1, 2, 3))
    assert(Snapshot.currentVersion(spark, base) === Some(1L))
  }

  test("reader grace window: a version resolved before a commit+vacuum cycle stays readable") {
    val base = Files.createTempDirectory("snap-grace").toString
    Snapshot.commit(spark, base, Map("a" -> Seq(1L, 2L).toDF("x")))
    // a long-running reader resolves the CURRENT snapshot now…
    val pinned = Snapshot.read(spark, base, "a", schemaA)
    // …then the writer runs one full commit+vacuum(keep=2) cycle
    Snapshot.commit(spark, base, Map("a" -> Seq(3L).toDF("x")))
    Snapshot.vacuum(spark, base, keep = 2)
    // keep=2 retains the reader's version: its lazy plan still executes
    assert(pinned.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // a SECOND cycle evicts it — the documented boundary: readers whose
    // jobs outlive multiple commits must pin (persist/localCheckpoint)
    Snapshot.commit(spark, base, Map("a" -> Seq(4L).toDF("x")))
    Snapshot.vacuum(spark, base, keep = 2)
    assert(!new java.io.File(base, "v0").exists())
  }

  test("sidecars publish atomically with their frames under the same version") {
    val base = Files.createTempDirectory("snap-side").toString
    Snapshot.commit(spark, base, Map("a" -> Seq(1L).toDF("x")),
      Map("_meta.txt" -> "total 1\n"))
    Snapshot.commit(spark, base, Map("a" -> Seq(2L, 3L).toDF("x")),
      Map("_meta.txt" -> "total 3\n"))
    // reader resolves ONE version of both: counts and meta agree
    assert(Snapshot.readSidecar(spark, base, "_meta.txt") === Some("total 3\n"))
    assert(Snapshot.read(spark, base, "a", schemaA).count() === 2L)
    // pointer rolled back (crash before publish): the PAIR rolls back
    Storage.writeTextFileAtomic(spark, s"$base/_current.txt", "0\n")
    assert(Snapshot.readSidecar(spark, base, "_meta.txt") === Some("total 1\n"))
    assert(Snapshot.read(spark, base, "a", schemaA).count() === 1L)
  }
}
