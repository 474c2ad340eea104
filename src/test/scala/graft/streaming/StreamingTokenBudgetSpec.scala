package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.Sampling
import graft.sources.Tables

/** Streaming token-budget admission: the streamed mix must equal the
  * hand-chained incremental fills batch-for-batch (and the plain batch
  * fill when everything arrives at once). */
class StreamingTokenBudgetSpec extends SparkSpecBase {

  private val budgets = (0 until 19).map(i => s"src$i" -> (80L + 30L * (i % 3)))

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("source"),
      size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n_tokens"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_tokens", LongType)))

  private def runStream(srcGlob: String,
      initial: Map[String, Long] = Map.empty): Seq[(Long, Long, Long)] = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(srcGlob)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = StreamingTokenBudget.admit(
      stream, "doc_id", "source", "n_tokens", budgets,
      (batch, id) => collected.synchronized {
        collected ++= batch.collect().map(r =>
          (r.getLong(0), r.getLong(3), id))
      }, initialTotals = initial)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stb-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    collected.toSeq
  }

  test("streamed admission equals the chained incremental fills, batch for batch") {
    val b0 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
    val src = Files.createTempDirectory("graft-stb-src").toString
    b0.coalesce(1).write.mode("append").json(s"$src/f0")
    b1.coalesce(1).write.mode("append").json(s"$src/f1")

    val got = runStream(s"$src/f*")
    // hand-chain the batch operators
    val fill0 = Sampling.tokenBudgetFill(b0, "doc_id", "source", "n_tokens", budgets)
    val want0 = fill0.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val fill1 = Sampling.tokenBudgetFillIncremental(
      b1, "doc_id", "source", "n_tokens", budgets,
      fill0.select(col("source"), col("n_tokens")))
    val want1 = fill1.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got.filter(_._3 == 0).map(t => t._1 -> t._2).toMap === want0)
    assert(got.filter(_._3 == 1).map(t => t._1 -> t._2).toMap === want1)
    assert(want0.nonEmpty && want1.nonEmpty,
      "fixture must admit documents in BOTH batches for the chain to bite")
  }

  test("single-batch replay equals the batch fill; initialTotals resumes a half-filled mix") {
    val src = Files.createTempDirectory("graft-stb-one").toString
    docs.coalesce(1).write.mode("append").json(s"$src/f0")
    val got = runStream(s"$src/f*")
    val want = Sampling.tokenBudgetFill(docs, "doc_id", "source", "n_tokens", budgets)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got.map(t => t._1 -> t._2).toMap === want)

    // resume: with every budget already consumed, nothing is admitted
    val full = budgets.map { case (g, b) => g -> b }.toMap
    val none = runStream(s"$src/f*", initial = full)
    assert(none.isEmpty)
  }
}
