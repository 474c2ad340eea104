package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.QualityClassifier
import graft.sources.Tables

/** Streaming classifier scoring under frozen trained weights: the
  * replayed corpus's streamed scores must equal the batch scorer's
  * exactly — and because the scorer is a stateless projection, the
  * whole corpus emits in ONE micro-batch with no watermark dance (cf.
  * StreamingPerplexitySpec's sentinel machinery). */
class StreamingQualityClassifierSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("streamed scores under frozen weights equal batch scores exactly") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)

    // train on the standing corpus, round-trip the weights through
    // their persisted form (plain longs)
    val w = QualityClassifier.trainWeights(corpus, "doc_id", "text")
      .map(_.toString.toLong)
    val expected = QualityClassifier.scoreWithWeights(
      delta, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(expected.nonEmpty)

    val src = Files.createTempDirectory("graft-sclf-src").toString
    delta.select(col("doc_id"), col("text"))
      .coalesce(1).write.mode("append").json(src)
    val out = Files.createTempDirectory("graft-sclf-out").toString
    val q = StreamingQualityClassifier.scoreStream(
      spark.readStream.schema(schema).json(src), "doc_id", "text", w)
      .select("doc_id", "n_tokens", "clf_prob", "clf_label")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sclf-ck").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()

    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_tokens", LongType),
      StructField("clf_prob", DoubleType), StructField("clf_label", IntegerType)))
    val got = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === expected, s"streamed ${got.size} vs batch ${expected.size}")
  }
}
