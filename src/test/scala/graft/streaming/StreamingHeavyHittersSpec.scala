package graft.streaming

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.HeavyHitters

/** Streaming heavy hitters: the finalized answer over the replayed
  * corpus must equal the batch operator row for row, across any
  * micro-batch split, with per-shard eviction running constantly and
  * the capacity bound held by every emitted snapshot. */
class StreamingHeavyHittersSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Zipf-ish skewed token stream (the HeavyHittersSpec generator). */
  private def skewedDoc(rnd: Random, n: Int, vocab: Int): String = {
    val w = Array.tabulate(vocab)(i => 1.0 / (i + 1))
    val cum = w.scanLeft(0.0)(_ + _).tail
    val tot = cum.last
    Seq.fill(n) {
      val x = rnd.nextDouble() * tot
      val i = cum.indexWhere(x <= _)
      s"w${if (i < 0) vocab - 1 else i}"
    }.mkString(" ")
  }

  private def runStream(srcGlob: String, capacity: Int, nShards: Int) = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(srcGlob)
    val out = StreamingHeavyHitters.candidateStream(
      spark, stream, "text", n = 2, capacity = capacity, nShards = nShards)
    val q = out.writeStream.format("memory")
      .queryName("hh_summaries").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-shh-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("hh_summaries")
  }

  test("finalized stream equals the batch operator on the replayed corpus") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(42)
    val docs = Seq.tabulate(150)(i => (i.toLong, skewedDoc(rnd, 30, 60)))
    val df = docs.toDF("doc_id", "text")
    val src = Files.createTempDirectory("graft-shh-src").toString
    for (b <- 0 until 3)
      df.filter(pmod(col("doc_id"), lit(3)) === b).coalesce(1)
        .write.mode("append").json(s"$src/f$b")

    // capacity 64 per shard over 2 shards: the skewed bigram space is
    // far wider than 128 counters, so eviction runs constantly — yet
    // the finalized answer must still be exact (capacity 64 > 1/phi)
    val summaries = runStream(s"$src/f*", capacity = 64, nShards = 2)
    assert(summaries.filter(size(col("grams")) > 64).count() == 0,
      "a shard snapshot exceeded its capacity bound")
    val phi = 0.02
    val got = StreamingHeavyHitters.heavyHittersFromSummaries(
        summaries, df, "text", n = 2, phi = phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = HeavyHitters.heavyHitters(df, "text", n = 2, phi = phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce heavy hitters")

    // the guarantee validation: serving a phi finer than the stream's
    // capacity must refuse, not silently under-report
    intercept[IllegalArgumentException] {
      StreamingHeavyHitters.heavyHittersFromSummaries(
        summaries, df, "text", n = 2, phi = 0.01)
    }
    spark.sql("DROP TABLE IF EXISTS hh_summaries")
  }
}
