package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.Dedup

/** The streaming span twin's contract: on a bounded replay whose
  * arrival order follows id order, the finalized span set equals the
  * batch `Dedup.sharedSpans` run (guard off — the fixture is below
  * every cap) with each pair oriented (later arrival, earlier
  * arrival). */
class StreamingSpanDedupSpec extends SparkSpecBase {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", StringType)))

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"${prefix}$i")

  test("replayed corpus: finalized spans equal the batch sharedSpans run") {
    // doc 1 carries a 14-token passage; doc 3 quotes it later (span 14
    // at (30, 20)); doc 2 is unrelated; doc 4 quotes a DIFFERENT
    // passage of doc 2 (span 13); doc 5 shares nothing
    val p1 = words("s", 14)
    val p2 = words("q", 13)
    val rows = Seq(
      (1L, (words("a", 30) ++ p1 ++ words("z", 16)).mkString(" "), "2024-01-01T10:00:00"),
      (2L, (words("b", 10) ++ p2 ++ words("c", 17)).mkString(" "), "2024-01-01T10:01:00"),
      (3L, (words("d", 20) ++ p1 ++ words("e", 6)).mkString(" "), "2024-01-01T10:02:00"),
      (4L, (p2 ++ words("f", 27)).mkString(" "), "2024-01-01T10:03:00"),
      (5L, words("g", 40).mkString(" "), "2024-01-01T10:04:00"))
    val batch = rows.toDF("doc_id", "text", "ts")

    val expected = Dedup.sharedSpans(batch, "doc_id", "text",
        maxDocFreqFraction = None)
      .collect()
      // batch orients (min, max); arrivals follow id order, so the
      // stream reports (later=max, earlier=min) with starts swapped
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getInt(5), r.getInt(4)))
      .toSet
    assert(expected.nonEmpty && expected.size >= 2,
      s"fixture must plant at least two span pairs: $expected")

    val src = Files.createTempDirectory("graft-sspan-src").toString
    batch.coalesce(1).write.mode("append").json(src)
    val stream = spark.readStream.schema(schema).json(src)
    val matchOut = Files.createTempDirectory("graft-sspan-match").toString
    val q = StreamingSpanDedup.spanMatchStream(
      spark, stream, "doc_id", "text", timeCol = "ts", horizonMinutes = 600)
      .writeStream.format("parquet").option("path", matchOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-sspan-ck").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()

    val matchSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("event_time", TimestampType),
      StructField("matched_doc_id", LongType),
      StructField("pos_new", IntegerType), StructField("pos_old", IntegerType)))
    val got = StreamingSpanDedup.spansFromMatches(
      spark.read.schema(matchSchema).parquet(matchOut))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
      .toSet
    assert(got === expected,
      s"streamed $got vs batch-oriented $expected")
  }

  test("horizon: spans against arrivals older than the horizon are forgotten") {
    val p = words("s", 14)
    val rows = Seq(
      (1L, (p ++ words("a", 16)).mkString(" "), "2024-01-01T10:00:00"),
      // 2 arrives 30 minutes later — beyond the 10-minute horizon
      (2L, (words("b", 12) ++ p).mkString(" "), "2024-01-01T10:30:00"),
      // 3 quotes the passage 5 minutes after 2 — inside the horizon
      (3L, (words("c", 8) ++ p).mkString(" "), "2024-01-01T10:35:00"))
    val batch = rows.toDF("doc_id", "text", "ts")
    val src = Files.createTempDirectory("graft-sspan2-src").toString
    batch.coalesce(1).write.mode("append").json(src)
    val stream = spark.readStream.schema(schema).json(src)
    val matchOut = Files.createTempDirectory("graft-sspan2-match").toString
    val q = StreamingSpanDedup.spanMatchStream(
      spark, stream, "doc_id", "text", timeCol = "ts", horizonMinutes = 10)
      .writeStream.format("parquet").option("path", matchOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-sspan2-ck").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()
    val matchSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("event_time", TimestampType),
      StructField("matched_doc_id", LongType),
      StructField("pos_new", IntegerType), StructField("pos_old", IntegerType)))
    val pairs = StreamingSpanDedup.spansFromMatches(
      spark.read.schema(matchSchema).parquet(matchOut))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2-vs-1 is beyond the horizon (no pair); 3-vs-2 is inside; 3-vs-1
    // is 35 minutes apart (no pair)
    assert(pairs === Set((3L, 2L)), pairs)
  }
}
