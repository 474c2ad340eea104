package graft.operators

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.fs.permission.FsPermission

import graft.SparkSpecBase

/** A corpus-open-counting FileSystem (the StorageSchemeSpec harness with
  * a counter on `open`): every read of a data file under the scheme
  * increments a global counter, so a spec can MEASURE how many times an
  * executed pipeline physically re-opens its input — the audit that
  * distinguishes "one corpus scan" as a verified property from a plan
  * comment. */
class GraftCountingFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftcount"
  override def getUri: java.net.URI = java.net.URI.create("graftcount:///")

  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "graft", "graft", s.getPath)
  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    if (f.getName.endsWith(".parquet"))
      GraftCountingFileSystem.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object GraftCountingFileSystem {
  val opens = new AtomicInteger(0)
}

/** The curation pipeline's corpus-scan audit (round-10 verdict item 7):
  * run `Curation.curate` with EVERY stage enabled (quality/lang floor,
  * exact + near-dup dedup, LM-perplexity cut, trained-classifier cut,
  * span trim, split) over a parquet corpus served through the counting
  * FS, and count physical opens of the corpus data file end to end.
  *
  * Measured on this fixture (local[*], Spark 4.1, one data file):
  * **4 opens with `base` materialized** (Curation.curate's lazy
  * localCheckpoint — one data scan plus fixed footer/planning reads),
  * **6 opens without it** (the fingerprint/semi-join/shingle subtrees
  * each rescan — verified by detaching the checkpoint while developing
  * this spec). The assertion pins the one-scan level: a second corpus
  * scan adds ≥2 opens and fails loudly. Every downstream stage (LM,
  * classifier, trim, split) reads checkpointed survivor state, never
  * the file — which is exactly what the bound proves. */
class CurationScanAuditSpec extends SparkSpecBase {

  test("all-stages curate opens the corpus data file for exactly one scan") {
    val spark2 = spark
    import spark2.implicits._
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftcount.impl", classOf[GraftCountingFileSystem].getName)

    // fixture with work for every stage: near-dup groups (long
    // shared-prefix variants), exact dups, a shared span, and BOTH
    // classifier seed bands among survivors — "the of"-prefixed
    // distinct-rich docs score ≈1.16 (positive seeds ≥ 1.07), the
    // 17-distinct/13-repeat docs score ≈0.83 (negative seeds ≤ 0.90,
    // the StreamingCurationSpec lowQualitySurvivor recipe)
    val rows = (0 until 40).flatMap { g =>
      val words = Seq("the", "of") ++ (0 until 28).map(w => s"w${g}_$w")
      val doc = words.mkString(" ")
      val nearDup = (words.dropRight(1) :+ s"chg_$g").mkString(" ")
      Seq((g * 3L, doc), (g * 3 + 1L, if (g % 4 == 0) doc else nearDup))
    } ++ (0 until 10).map { j =>
      val distinct = Seq("the", "of") ++ (0 until 15).map(i => s"lq${j}_$i")
      val repeats = (0 until 13).map(i => s"lq${j}_$i")
      (1000L + j, (distinct ++ repeats).mkString(" "))
    }
    val dir = Files.createTempDirectory("graft-scan-audit")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/corpus")
    // exactly one data file, read back through the counting scheme
    val docs = spark.read.parquet(s"graftcount://$dir/corpus")

    GraftCountingFileSystem.opens.set(0)
    val cfg = Curation.Config(
      minQuality = 0.1, trimSpans = true,
      perplexityFilter = true, classifierFilter = true)
    val out = Curation.curate(docs, "doc_id", "text", cfg).collect()
    assert(out.nonEmpty, "all-stages curation must keep survivors")
    val opens = GraftCountingFileSystem.opens.get()
    // measured: 1 data scan + footer reads. A second corpus scan (the
    // pre-fix fingerprint/semi-join/shingle fan-out measured 3) pushes
    // the total past this bound.
    assert(opens <= 4,
      s"corpus file opened $opens times — the all-stages pipeline must " +
        "perform exactly one corpus scan (base is materialized once; " +
        "every later stage reads checkpointed survivors)")
  }
}
