package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.Dedup

/** Streaming cluster maintenance: replayed dup-notice folds must land
  * on exactly the batch components of the full notice graph, and
  * re-delivered notices (at-least-once) must be no-ops by algebra. */
class StreamingClusterMaintenanceSpec extends SparkSpecBase {

  import spark.implicits._

  private val noticeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("event_time", TimestampType),
    StructField("matched_doc_id", LongType)))

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("per-batch folds equal one-shot components; redelivery is a no-op") {
    // arrival-time notice forest: {2→1, 3→2} (one cluster), {11→10},
    // then a later batch bridges via {20→4(fresh root), 21→20} and
    // re-delivers 2→1 (at-least-once)
    val labelsPath = Files.createTempDirectory("graft-scm-labels").toString
    val b1 = Seq((2L, ts(1), 1L), (3L, ts(2), 2L), (11L, ts(3), 10L))
      .toDF("doc_id", "event_time", "matched_doc_id")
    val b2 = Seq((20L, ts(4), 4L), (21L, ts(5), 20L), (2L, ts(1), 1L))
      .toDF("doc_id", "event_time", "matched_doc_id")
    StreamingClusterMaintenance.foldNotices(spark, b1, labelsPath)
    val afterB1 = StreamingClusterMaintenance.readLabels(spark, labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterB1 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    StreamingClusterMaintenance.foldNotices(spark, b2, labelsPath)
    val afterB2 = StreamingClusterMaintenance.readLabels(spark, labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-shot anchor: components of ALL notices at once
    val oneShot = Dedup.duplicateClusters(
      b1.unionByName(b2)
        .select(col("doc_id").as("doc_a"), col("matched_doc_id").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterB2 === oneShot)
    // exact redelivery of an entire batch changes nothing
    StreamingClusterMaintenance.foldNotices(spark, b2, labelsPath)
    val afterRedeliver = StreamingClusterMaintenance.readLabels(spark, labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterRedeliver === afterB2)
  }

  test("end to end: phash notice stream maintains the labels table across micro-batches") {
    // two re-encoded copies of one image arriving after the original →
    // the detector emits notices; the maintained labels must equal the
    // batch components of those notices
    import graft.operators.MediaCodec
    def blob(seed: Int): Array[Byte] = {
      val rng = new java.util.Random(seed)
      val G = 8
      val grid = Array.fill(3, G + 1, G + 1)(rng.nextInt(256))
      val px = new Array[Byte](64 * 64 * 3)
      var y = 0
      while (y < 64) {
        val gy = y.toDouble * G / 64; val y0 = gy.toInt; val fy = gy - y0
        var x = 0
        while (x < 64) {
          val gx = x.toDouble * G / 64; val x0 = gx.toInt; val fx = gx - x0
          val i = (y * 64 + x) * 3
          var c = 0
          while (c < 3) {
            val g = grid(c)
            val v = g(y0)(x0) * (1 - fx) * (1 - fy) + g(y0)(x0 + 1) * fx * (1 - fy) +
              g(y0 + 1)(x0) * (1 - fx) * fy + g(y0 + 1)(x0 + 1) * fx * fy
            px(i + c) = v.toInt.toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      px
    }
    val a = blob(1)
    val rows = Seq(
      (1L, MediaCodec.encodePng24(64, 64, a), "2024-01-01T10:01:00"),
      (2L, MediaCodec.encodeJpeg24(64, 64, a), "2024-01-01T10:02:00"),
      (3L, MediaCodec.encodePng24(64, 64, blob(5)), "2024-01-01T10:03:00"),
      (4L, MediaCodec.resizeBmp24(
        MediaCodec.encodeBmp24(64, 64, a), 32, 32).get, "2024-01-01T10:04:00"))
    val src = Files.createTempDirectory("graft-scm-src").toString
    rows.toDF("media_id", "bytes", "ts").coalesce(1)
      .write.mode("append").parquet(src)
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("bytes", BinaryType),
      StructField("ts", StringType)))
    val labelsPath = Files.createTempDirectory("graft-scm-lab2").toString
    val notices = StreamingDedup.phashDupStream(spark,
      spark.readStream.schema(mediaSchema).parquet(src), "media_id", "bytes",
      timeCol = "ts", horizonMinutes = 600)
    val q = StreamingClusterMaintenance.maintainClusters(spark, notices, labelsPath)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scm-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val labels = StreamingClusterMaintenance.readLabels(spark, labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the copy cluster {1,2,4} collapses to min id 1; image 3 never
    // appears (no notice names it, it duplicated nothing)
    assert(labels === Map(1L -> 1L, 2L -> 1L, 4L -> 1L), s"got $labels")
  }
}
