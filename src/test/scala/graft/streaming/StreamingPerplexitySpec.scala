package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Streaming perplexity scoring under a frozen persisted LM: the
  * replayed corpus's streamed scores must equal the batch operator's
  * exactly (the StreamingCurationSpec parity pattern). */
class StreamingPerplexitySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  test("streamed scores under the frozen persisted LM equal batch scores exactly") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)

    // train once, persist, reload — the frozen-model production flow
    val (uni, bi) = TextAnalysis.bigramLmModel(corpus, "text")
    val modelDir = Files.createTempDirectory("graft-sperp-model").toString
    uni.write.parquet(s"$modelDir/uni")
    bi.write.parquet(s"$modelDir/bi")
    val uniF = spark.read.parquet(s"$modelDir/uni")
    val biF = spark.read.parquet(s"$modelDir/bi")

    val expected = TextAnalysis.bigramPerplexityFromModel(
      delta, "doc_id", "text", uniF, biF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)

    // replay the delta as a file stream with synthetic event times; a
    // far-future single-token sentinel lands in a LATER micro-batch
    // (maxFilesPerTrigger = 1) purely to advance the watermark past the
    // delta's windows so append mode emits them — one token means the
    // sentinel itself can never produce a score row
    val src = Files.createTempDirectory("graft-sperp-src").toString
    delta
      .select(col("doc_id"), col("text"),
        timestamp_seconds(
          unix_timestamp(lit("2024-01-01 10:00:00")) + col("doc_id") % 300)
          .as("ts"))
      .coalesce(1).write.mode("append").json(s"$src/f0")
    // two sentinels: f1's arrival ADVANCES the watermark past the
    // delta's windows; f2's batch then runs under that watermark and
    // emits them (AvailableNow does not run a trailing no-data batch,
    // so the advance must be followed by a real one). The sentinel must
    // be ≥ 2 tokens: the operator's short-doc filter is pushed BELOW
    // the watermark node, and a filtered-out row never updates the
    // watermark. Its own window never expires, so it adds no sink row.
    Seq("f1", "f2").foreach { f =>
      spark.range(1)
        .select(lit(-1L).as("doc_id"), lit("sentinel sentinel").as("text"),
          lit("2024-01-02 10:00:00").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("append").json(s"$src/$f")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(s"$src/f*")

    val out = Files.createTempDirectory("graft-sperp-out").toString
    val q = StreamingPerplexity.scoreStream(
      stream, "doc_id", "text", "ts", uniF, biF)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sperp-ck").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.recentProgress.foreach(p => info(
      s"batch=${p.batchId} rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")} sinkRows=${p.sink.numOutputRows}"))
    q.stop()

    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bigrams", LongType),
      StructField("perplexity", DoubleType)))
    val got = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected,
      s"streamed ${got.size} rows vs batch ${expected.size}")
  }
}
