package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for a partitioned parquet table — the
  * maintenance operator every long-lived lakehouse layout needs: daily
  * micro-batch and streaming appends leave partitions full of KB-scale
  * files, and at 100 TB the per-file open/footer/task overhead comes to
  * dominate scan time. Each partition is rewritten into
  * ceil(bytes / targetBytes) files; untouched partitions are never
  * read or rewritten (the unit of work is one partition directory, so
  * daily compaction after ingest touches only the new date).
  *
  * Rewrite protocol per partition: read → repartition(n) → write to a
  * sibling temp dir → atomically swap via two renames. The swap window
  * is the two renames only; a crash before the first rename leaves the
  * original intact (the temp dir is garbage to be re-compacted).
  */
object Compaction {

  case class PartitionReport(
      partition: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path) =
    fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Compact every `partitionCol=value` directory under `tableRoot`
    * whose average data-file size is below `targetBytes`. */
  def compactTable(spark: SparkSession, tableRoot: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[PartitionReport] = {
    require(targetBytes > 0)
    val root = new Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val partitions = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
    partitions.flatMap { part =>
      val files = dataFiles(fs, part.getPath)
      val bytes = files.map(_.getLen).sum
      val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (files.size <= targetFiles) None
      else {
        val df = spark.read.parquet(part.getPath.toString)
        val tmp = new Path(part.getPath.getParent,
          s".compact_tmp_${part.getPath.getName}")
        fs.delete(tmp, true)
        df.repartition(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        val old = new Path(part.getPath.getParent,
          s".compact_old_${part.getPath.getName}")
        fs.delete(old, true)
        fs.rename(part.getPath, old)
        fs.rename(tmp, part.getPath)
        fs.delete(old, true)
        Some(PartitionReport(part.getPath.getName, files.size,
          dataFiles(fs, part.getPath).size, bytes))
      }
    }
  }
}
