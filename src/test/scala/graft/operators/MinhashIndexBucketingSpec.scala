package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucketed persisted MinHash/SimHash band indexes — the span
  * family's round-9 shuffle-elimination layout
  * (SpanIndexBucketingSpec) applied to the signature siblings: the
  * O(Δ) ingest join against a `write*BandIndexBucketed` table must
  * shuffle ONLY the delta side — the corpus band rows read
  * bucket-in-place — and return exactly what the direct
  * (recompute-the-corpus) incremental path returns. */
class MinhashIndexBucketingSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
  private def delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
  private def corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)

  /** Assert the single-exchange bucketed-join shape: exactly one
    * bb-partitioned exchange (the delta's) and a bucketed corpus scan. */
  private def assertDeltaOnlyExchange(df: DataFrame): Unit = {
    val full = df.queryExecution.executedPlan.toString
    // scope to AQE's final plan — the trailing "Initial Plan" section
    // repeats every node and would double the count
    val plan = full.split("== Initial Plan ==").head
    val bbExchanges = """Exchange hashpartitioning\(bb#""".r.findAllIn(plan).length
    assert(bbExchanges === 1,
      s"expected exactly 1 bb-exchange (delta side), got $bbExchanges:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"corpus side must be a bucketed scan:\n$plan")
  }

  private def withNoBroadcast[A](body: => A): A = {
    // disable auto-broadcast: at fixture scale the delta would
    // broadcast (also shuffle-free, but proving nothing about the
    // layout) — production deltas are far above any broadcast threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed-index incremental minhash: delta-only exchange, identical results") {
    val table = "mh_idx_bucketed_spec"
    val path = Files.createTempDirectory("graft-mh-bidx").toString
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Dedup.writeMinhashBandIndexBucketed(
      corpus, "doc_id", "text", table, nBuckets = 4, path = Some(path))
    try withNoBroadcast {
      val viaBucketed = Dedup.minhashPairsIncrementalFromIndex(
        delta, spark.table(table), "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      val direct = Dedup.minhashPairsIncremental(
        delta, corpus, "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      val got = viaBucketed.collect().toSeq
      assert(got.nonEmpty && got === direct.collect().toSeq)
      assertDeltaOnlyExchange(viaBucketed)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("minhash append preserves layout and equals the union-of-band-rows contract") {
    val base = corpus.filter(pmod(col("doc_id"), lit(2)) === 1)
    val batch = corpus.filter(pmod(col("doc_id"), lit(2)) === 0)
    val table = "mh_idx_append_spec"
    val path = Files.createTempDirectory("graft-mh-aidx").toString
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Dedup.writeMinhashBandIndexBucketed(
      base, "doc_id", "text", table, nBuckets = 4, path = Some(path))
    Dedup.appendToMinhashBandIndexBucketed(
      batch, "doc_id", "text", table, nBuckets = 4)
    withNoBroadcast {
      val viaAppended = Dedup.minhashPairsIncrementalFromIndex(
        delta, spark.table(table), "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      // frozen-decision reference: capped base index ∪ uncapped batch rows
      val reference = Dedup.minhashPairsIncrementalFromIndex(
        delta,
        Dedup.minhashBandIndex(base, "doc_id", "text")
          .unionByName(Dedup.minhashBandIndex(
            batch, "doc_id", "text", maxBucket = None)),
        "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      val got = viaAppended.collect().toSeq
      assert(got.nonEmpty && got === reference.collect().toSeq)
      assertDeltaOnlyExchange(viaAppended)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("bucketed-index incremental simhash: delta-only exchange, identical results") {
    val table = "sh_idx_bucketed_spec"
    val path = Files.createTempDirectory("graft-sh-bidx").toString
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Dedup.writeSimhashBandIndexBucketed(
      corpus, "doc_id", "text", table, nBuckets = 4, path = Some(path))
    try withNoBroadcast {
      val viaBucketed = Dedup.simhashPairsIncrementalFromIndex(
        delta, spark.table(table), "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      val direct = Dedup.simhashPairsIncremental(
        delta, corpus, "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      val got = viaBucketed.collect().toSeq
      assert(got.nonEmpty && got === direct.collect().toSeq)
      assertDeltaOnlyExchange(viaBucketed)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("simhash append preserves layout and equals the union-of-band-rows contract") {
    val base = corpus.filter(pmod(col("doc_id"), lit(2)) === 1)
    val batch = corpus.filter(pmod(col("doc_id"), lit(2)) === 0)
    val table = "sh_idx_append_spec"
    val path = Files.createTempDirectory("graft-sh-aidx").toString
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Dedup.writeSimhashBandIndexBucketed(
      base, "doc_id", "text", table, nBuckets = 4, path = Some(path))
    Dedup.appendToSimhashBandIndexBucketed(
      batch, "doc_id", "text", table, nBuckets = 4)
    withNoBroadcast {
      val viaAppended = Dedup.simhashPairsIncrementalFromIndex(
        delta, spark.table(table), "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      val reference = Dedup.simhashPairsIncrementalFromIndex(
        delta,
        Dedup.simhashBandIndex(base, "doc_id", "text")
          .unionByName(Dedup.simhashBandIndex(
            batch, "doc_id", "text", maxBucket = None)),
        "doc_id", "text")
        .orderBy("delta_id", "corpus_id")
      val got = viaAppended.collect().toSeq
      assert(got.nonEmpty && got === reference.collect().toSeq)
      assertDeltaOnlyExchange(viaAppended)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
