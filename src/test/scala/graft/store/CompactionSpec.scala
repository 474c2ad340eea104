package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class CompactionSpec extends SparkSpecBase {

  import spark.implicits._

  test("compaction collapses small files per partition, preserves rows, skips healthy partitions") {
    val root = Files.createTempDirectory("graft-compact").toString + "/t"
    // partition a: 20 tiny files; partition b: already 1 file
    (1 to 2000).map(i => (i.toLong, s"row_$i", "a")).toDF("id", "v", "p")
      .repartition(20)
      .write.partitionBy("p").mode("append").parquet(root)
    (1 to 100).map(i => (i.toLong + 10000, s"row_$i", "b")).toDF("id", "v", "p")
      .coalesce(1)
      .write.partitionBy("p").mode("append").parquet(root)
    val before = spark.read.parquet(root)
    val beforeRows = before.count()
    val beforeIds = before.agg(sum("id")).collect()(0).getLong(0)

    val reports = Compaction.compactTable(spark, root, targetBytes = 512L * 1024 * 1024)
    // only the fragmented partition was rewritten
    assert(reports.map(_.partition) === Seq("p=a"), reports)
    assert(reports.head.filesBefore === 20 && reports.head.filesAfter === 1, reports)

    val after = spark.read.parquet(root)
    assert(after.count() === beforeRows)
    assert(after.agg(sum("id")).collect()(0).getLong(0) === beforeIds)
    // idempotent: a second pass finds nothing to do
    assert(Compaction.compactTable(spark, root, 512L * 1024 * 1024).isEmpty)
  }
}
