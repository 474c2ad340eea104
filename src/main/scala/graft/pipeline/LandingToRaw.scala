package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.store.{LayerPaths, Storage}

/** Stage 1: landing → raw. Discovers date-suffixed drops
  * (`{table}_{YYYY-MM-DD}.{csv|jsonl}`), filters to the target ingestion
  * date, and copies bytes verbatim into the Hive-partitioned raw layer —
  * ref landing_to_raw_processor.py:64-149. Parsing is deliberately
  * absent (the reference's transform is a no-op, :107-114): raw
  * preserves source formats for schema-on-read.
  */
class LandingToRaw(spark: SparkSession, paths: LayerPaths, ingestionDate: String)
    extends Processor[Seq[LandingToRaw.FileInfo]] {

  override def jobName: String = s"landing_to_raw[$ingestionDate]"

  /** Filename → (table, date): split the stem on '_', last token must be
    * a date (two '-'), remainder is the table name — ref
    * landing_to_raw_processor.py:71-96. */
  override def extract(): Seq[LandingToRaw.FileInfo] =
    Storage.listObjects(spark, paths.landing).flatMap { full =>
      val fileName = full.substring(full.lastIndexOf('/') + 1)
      LandingToRaw.parseFileName(fileName).collect {
        case (table, date) if date == ingestionDate =>
          LandingToRaw.FileInfo(table, full, paths.rawKey(date, fileName))
      }
    }

  /** Server/filesystem-side byte copy per file — ref
    * landing_to_raw_processor.py:126-149. */
  override def load(files: Seq[LandingToRaw.FileInfo]): Long = {
    files.foreach(f => Storage.copyObject(spark, f.landingKey, f.rawKey))
    files.size.toLong
  }
}

object LandingToRaw {
  case class FileInfo(table: String, landingKey: String, rawKey: String)

  private val pattern = """^(.+)_(\d{4}-\d{2}-\d{2})\.(csv|jsonl|json)$""".r

  def parseFileName(fileName: String): Option[(String, String)] =
    fileName match {
      case pattern(table, date, _) => Some((table, date))
      case _ => None
    }
}
