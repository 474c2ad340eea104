package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Snapshot-manifest commits — a minimal multi-frame atomic-publish
  * primitive for the maintained-state operators (the survivor
  * pipeline's labels + keep-best state, any frozen-model pair that must
  * change TOGETHER):
  *
  *   - each commit writes its frames under `base/v<N>/<name>/` (fresh
  *     directories — never overwriting live data), then publishes by
  *     writing the version number to `base/_current.txt`;
  *   - the pointer write is ONE small object PUT — the commit point.
  *     Readers resolve the pointer first, then read that version's
  *     directories, so a reader mid-commit sees the previous fully
  *     written snapshot, never a torn mix of old labels + new state;
  *   - a crash before the pointer write leaves orphaned v<N> data and
  *     a perfectly consistent current snapshot — the failed fold's
  *     batch simply re-runs (the callers' folds are designed
  *     re-runnable against the old snapshot).
  *
  * This is the single load-bearing idea of table formats (Iceberg/Delta
  * commit pointers) cut down to what the maintained-state family needs;
  * production deployments with concurrent writers would use a real
  * table format — these folds have exactly one writer (the stream's
  * micro-batch loop), which is what makes the single-pointer scheme
  * sufficient. `vacuum` bounds the orphan/history footprint. */
object Snapshot {

  private val Pointer = "_current.txt"

  def currentVersion(spark: SparkSession, base: String): Option[Long] =
    if (!Storage.exists(spark, s"$base/$Pointer")) None
    else Some(Storage.readTextFile(spark, s"$base/$Pointer").trim.toLong)

  /** Write every frame under the next version, then publish it with the
    * single pointer PUT. Returns the committed version. */
  def commit(spark: SparkSession, base: String,
      frames: Map[String, DataFrame]): Long = {
    require(frames.nonEmpty, "a snapshot commit needs at least one frame")
    val next = currentVersion(spark, base).map(_ + 1L).getOrElse(0L)
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$base/v$next/$name")
    }
    Storage.writeTextFile(spark, s"$base/$Pointer", s"$next\n")
    next
  }

  /** Read `name` from the CURRENT snapshot — empty-but-typed when no
    * snapshot has ever committed (first-fold reads need no special
    * casing) or when this frame wasn't part of it. */
  def read(spark: SparkSession, base: String, name: String,
      schema: StructType): DataFrame =
    currentVersion(spark, base) match {
      case Some(v) if Storage.listObjects(spark, s"$base/v$v/$name")
          .exists(_.endsWith(".parquet")) =>
        spark.read.schema(schema).parquet(s"$base/v$v/$name")
      case _ =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Drop snapshot directories older than the newest `keep` versions
    * (orphans from failed commits included). Never touches the current
    * version. */
  def vacuum(spark: SparkSession, base: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least the current version")
    currentVersion(spark, base).foreach { cur =>
      val f = Storage.fileSystem(spark, base)
      val p = new org.apache.hadoop.fs.Path(base)
      if (f.exists(p)) f.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v") && n.drop(1).forall(_.isDigit)) {
          val v = n.drop(1).toLong
          if (v <= cur - keep) f.delete(st.getPath, true)
        }
      }
    }
  }
}
