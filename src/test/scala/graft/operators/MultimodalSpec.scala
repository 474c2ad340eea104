package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

class MultimodalSpec extends SparkSpecBase {

  lazy val media = Multimodal.syntheticMediaFromText(
    Tables.documents(spark, sfDir), "doc_id", "text")

  test("synthetic media table has the binary-column schema") {
    val schema = media.toDF().schema
    assert(schema("bytes").dataType.typeName === "binary")
    assert(schema("media_id").dataType.typeName === "long")
    assert(media.count() === 500)
  }

  test("feature extraction is deterministic, drops the payload, and preserves cardinality") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 500)
    assert(f1.map(_.checksum).sameElements(f2.map(_.checksum)))
    // brightness/entropy in sane ranges; text bytes are ASCII-ish
    assert(f1.forall(f => f.brightness > 0 && f.brightness < 1))
    assert(f1.forall(f => f.entropy > 0 && f.entropy <= 8))
    assert(f1.forall(_.n_bytes > 0))
  }

  test("repartitionForMedia sizes partitions by payload bytes") {
    val df = media.toDF()
    val re = Multimodal.repartitionForMedia(df, "bytes", targetBytes = 16 * 1024)
    assert(re.rdd.getNumPartitions >= 5) // ~130KB corpus / 16KB target
    assert(re.count() === 500)
  }

  test("frame sampling fans out video rows without accumulating state") {
    val frames = Multimodal.sampleFrames(media.filter(col("kind") === "video"), everyMs = 5000)
    val n = frames.count()
    assert(n > 0)
    val perMedia = frames.groupBy("media_id").count().collect()
    // duration_ms = 100×chars; 5s sampling → chars/50 frames per item
    assert(perMedia.forall(_.getAs[Long]("count") >= 1))
    assert(frames.schema("frame_bytes").dataType.typeName === "binary")
  }
}
