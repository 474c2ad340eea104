package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class MergeSpec extends SparkSpecBase {

  import spark.implicits._

  private val eot = Date.valueOf("2099-12-31")
  private val d0 = Date.valueOf("2024-01-01")
  private val dEff = Date.valueOf("2024-06-01")

  // dim: key 1 history+current, keys 2..4 current-only
  private def dim = Seq(
    // key 1: one closed historical version + a current one
    (1L, "acme", 10.0, d0, Date.valueOf("2024-03-01"), false),
    (1L, "acme", 11.0, Date.valueOf("2024-03-01"), eot, true),
    (2L, "beta", 20.0, d0, eot, true), // will change
    (3L, "gamma", 30.0, d0, eot, true), // no-op update (same value)
    (4L, "delta", 40.0, d0, eot, true)) // no update at all
    .toDF("k", "name", "bal", "valid_from", "valid_to", "is_current")

  private def updates = Seq(
    (2L, 21.0), // real change
    (3L, 30.0), // no-op
    (5L, 50.0)) // brand-new key
    .toDF("k", "bal")

  test("scd2Merge: close-changed, keep-unchanged, insert-new, preserve history") {
    val out = Merge.scd2Merge(dim, updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDate(3), r.getDate(4), r.getBoolean(5)))
      .toSet
    val expected = Set(
      // history untouched
      (1L, "acme", 10.0, d0, Date.valueOf("2024-03-01"), false),
      // current without update untouched
      (1L, "acme", 11.0, Date.valueOf("2024-03-01"), eot, true),
      (4L, "delta", 40.0, d0, eot, true),
      // no-op change suppressed
      (3L, "gamma", 30.0, d0, eot, true),
      // real change: closed + reopened with attrs carried over
      (2L, "beta", 20.0, d0, dEff, false),
      (2L, "beta", 21.0, dEff, eot, true),
      // insert: attributes null
      (5L, null, 50.0, dEff, eot, true))
    assert(out === expected)
  }

  test("scd2Merge is idempotent: re-applying the same batch is a no-op") {
    val once = Merge.scd2Merge(dim, updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
    val twice = Merge.scd2Merge(once, updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-07-01", endOfTime = "2099-12-31")
    val a = once.collect().map(_.toSeq).toSet
    val b = twice.collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("duplicate update keys raise instead of silently fanning out history") {
    val dupUpdates = Seq((2L, 21.0), (2L, 22.0)).toDF("k", "bal")
    val ex = intercept[Exception] {
      Merge.scd2Merge(dim, dupUpdates, "k",
        trackedCols = Seq("bal"), attrCols = Seq("name"),
        effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("multiple update rows")), ex.toString)
  }

  test("partitioned dimension: delta merge prunes to the current partition — closed rows never read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_dim").toString
    dim.write.partitionBy("is_current").mode("overwrite").parquet(dir)

    // 1) plan proof: every file scan in the delta plan carries is_current
    //    as a PARTITION filter (pruned at listing time, not post-scan)
    val delta = Merge.scd2MergeDelta(spark.read.schema(dim.schema).parquet(dir), updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
    // (string match: AQE's AdaptiveSparkPlanExec holds its input plan as
    // a field, not a TreeNode child, so collect{} can't reach the scans)
    val planStr = delta.queryExecution.executedPlan.toString
    val dimScans = planStr.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains(dir)).toSeq
    assert(dimScans.nonEmpty, planStr)
    dimScans.foreach { l =>
      assert(l.contains("PartitionFilters: [isnotnull(is_current"),
        s"dim scan without is_current partition filter:\n$l")
    }

    // 2) physical proof: delete the history partition's files outright —
    //    the delta merge must not notice
    val expectedDelta = delta.collect().map(_.toSeq).toSet
    import scala.reflect.io.Directory
    assert(new Directory(new java.io.File(s"$dir/is_current=false")).deleteRecursively())
    val gutted = Merge.scd2MergeDelta(spark.read.schema(dim.schema).parquet(dir), updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
    assert(gutted.collect().map(_.toSeq).toSet === expectedDelta)
  }

  test("delta write protocol (append closed, overwrite current) reproduces the full merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_proto").toString
    dim.write.partitionBy("is_current").mode("overwrite").parquet(dir)
    val full = Merge.scd2Merge(dim, updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
      .collect().map(_.toSeq).toSet

    // materialize the delta before touching the files it reads
    val delta = Merge.scd2MergeDelta(spark.read.schema(dim.schema).parquet(dir), updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
      .localCheckpoint(true)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // newly-closed versions append to history; the current partition is
      // dynamically overwritten — history files are never rewritten
      delta.filter(!col("is_current"))
        .write.partitionBy("is_current").mode("append").parquet(dir)
      delta.filter(col("is_current"))
        .write.partitionBy("is_current").mode("overwrite").parquet(dir)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // partitionBy writes is_current last; reorder to the dim column order
    val readBack = spark.read.schema(dim.schema).parquet(dir)
      .select(dim.columns.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(readBack === full)
  }

  test("exactly one current row per key after merge") {
    val out = Merge.scd2Merge(dim, updates, "k",
      trackedCols = Seq("bal"), attrCols = Seq("name"),
      effectiveDate = "2024-06-01", endOfTime = "2099-12-31")
    val perKey = out.filter(col("is_current")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perKey === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }
}
