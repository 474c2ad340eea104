package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.Curation

/** End-to-end streaming curation: the streamed curated set must equal
  * `Curation.curate` on the same replayed corpus within the horizon —
  * quality/langid filtering, exact-copy and near-dup dropping, and the
  * key-stable split all included, down to the metric doubles. */
class StreamingCurationSpec extends SparkSpecBase {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", StringType)))

  /** Corpus exercising every stage. Passing docs are 24 unique words
    * including "the of" (lang "en", distinct ratio 1, quality ≈ 1.16);
    * group structure: every group has a base, group%2==0 adds a
    * one-word-changed near-variant (shingle Jaccard ≈ 0.84, clearly
    * above the 0.5 cut), group%3==0 adds a verbatim copy. Interleaved
    * rejects: a Spanish-profile doc (language filter) and a
    * stopword-stuffed doc (quality floor) — neither may spend dedup
    * state. Timestamps follow doc_id a minute apart so arrival order is
    * id order (the batch-anchor regime). */
  private def corpus: Seq[(Long, String, String)] = {
    def ts(id: Long) = f"2024-01-01T${10 + id / 60}%02d:${id % 60}%02d:00"
    var id = -1L
    def next(): Long = { id += 1; id }
    (0 until 6).flatMap { g =>
      val words = Seq("the", "of") ++ (0 until 22).map(w => s"w${g}_$w")
      val base = words.mkString(" ")
      val variant = (words.dropRight(1) :+ s"changed_$g").mkString(" ")
      val rows = Seq.newBuilder[(Long, String, String)]
      val bid = next(); rows += ((bid, base, ts(bid)))
      if (g % 2 == 0) { val v = next(); rows += ((v, variant, ts(v))) }
      if (g % 3 == 0) { val c = next(); rows += ((c, base, ts(c))) }
      if (g % 2 == 1) {
        val es = next()
        rows += ((es, "el la de y que en los " +
          (0 until 17).map(w => s"es${g}_$w").mkString(" "), ts(es)))
        val junk = next()
        rows += ((junk, Seq.fill(24)("the").mkString(" "), ts(junk)))
      }
      rows.result()
    } ++ {
      // the exact-dedup edge regimes the batch fingerprint stage covers:
      // sub-shingle (< nGram tokens) docs — a kept base, a verbatim copy
      // (must drop), a distinct short doc (must keep) — and a CASE
      // variant of group 0's base (filler words uppercased: passes the
      // language filter, lower(trim) collapses to the base fingerprint,
      // raw tokens share nothing)
      val caseVariant = "the of " + (0 until 22).map(w => s"W0_$w").mkString(" ")
      Seq("of cat", "of cat", "of dog", caseVariant).map { text =>
        val i = next(); (i, text, ts(i))
      }
    }
  }

  test("streamed curated set equals Curation.curate on the replayed corpus") {
    val batch = corpus.toDF("doc_id", "text", "ts")
    val expected = Curation.curate(batch, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(expected.nonEmpty)
    // the fixture must really exercise every stage: some docs rejected
    // by stage 1-2, some dropped as dups, survivors in several splits
    assert(expected.size < corpus.size)

    val src = Files.createTempDirectory("graft-scur-src").toString
    batch.coalesce(1).write.mode("append").json(src)
    def stream() = spark.readStream.schema(schema).json(src)

    // candidate sink: stage 1-2 survivors with their metrics
    val candOut = Files.createTempDirectory("graft-scur-cand").toString
    val q1 = StreamingCuration.qualifiedStream(stream(), "doc_id", "text", timeCol = "ts")
      .select("doc_id", "quality_score", "predicted_lang")
      .writeStream.format("parquet").option("path", candOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-ck1").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // drop-notice sink: near-dup/exact-copy flags among the qualified
    val dropOut = Files.createTempDirectory("graft-scur-drop").toString
    val q2 = StreamingCuration.dropNotices(spark, stream(), "doc_id", "text",
      timeCol = "ts", horizonMinutes = 600)
      .writeStream.format("parquet").option("path", dropOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-ck2").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q1.stop()
    q2.awaitTermination(120000); q2.stop()

    val candSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("quality_score", DoubleType),
      StructField("predicted_lang", StringType)))
    val noticeSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("event_time", TimestampType),
      StructField("matched_doc_id", LongType)))
    val curated = StreamingCuration.curatedFromSinks(
      spark.read.schema(candSchema).parquet(candOut),
      spark.read.schema(noticeSchema).parquet(dropOut), "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(curated === expected,
      s"streamed ${curated.toSeq.sortBy(_._1)} vs batch ${expected.toSeq.sortBy(_._1)}")
  }

  test("LM-on finalization equals Curation.curate with the perplexity stage on") {
    val batch = corpus.toDF("doc_id", "text", "ts")
    val cfg = Curation.Config(perplexityFilter = true,
      // 8 fixture survivors: ceil(8*90%) = 8 would cut nothing — 75%
      // keeps 6 and exercises the drop
      perplexityKeepPercent = 75)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    val expected = Curation.curate(batch, "doc_id", "text", cfg)
      .collect().map(key).toSet
    assert(expected.nonEmpty)
    // the stage must really cut: fewer survivors than the LM-off run
    val lmOff = Curation.curate(batch, "doc_id", "text").count()
    assert(expected.size < lmOff,
      s"perplexity stage cut nothing (${expected.size} of $lmOff)")

    val src = Files.createTempDirectory("graft-scur-lm-src").toString
    batch.coalesce(1).write.mode("append").json(src)
    def stream() = spark.readStream.schema(schema).json(src)
    // LM-on finalization needs the text through the candidate sink
    val candOut = Files.createTempDirectory("graft-scur-lm-cand").toString
    val q1 = StreamingCuration.qualifiedStream(stream(), "doc_id", "text", timeCol = "ts")
      .select("doc_id", "text", "quality_score", "predicted_lang")
      .writeStream.format("parquet").option("path", candOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-lm-ck1").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val dropOut = Files.createTempDirectory("graft-scur-lm-drop").toString
    val q2 = StreamingCuration.dropNotices(spark, stream(), "doc_id", "text",
      timeCol = "ts", horizonMinutes = 600)
      .writeStream.format("parquet").option("path", dropOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-lm-ck2").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q1.stop()
    q2.awaitTermination(120000); q2.stop()

    val candSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("quality_score", DoubleType),
      StructField("predicted_lang", StringType)))
    val noticeSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("event_time", TimestampType),
      StructField("matched_doc_id", LongType)))
    val curated = StreamingCuration.curatedFromSinks(
      spark.read.schema(candSchema).parquet(candOut),
      spark.read.schema(noticeSchema).parquet(dropOut), "doc_id", cfg)
      .collect().map(key).toSet
    assert(curated === expected,
      s"streamed ${curated.toSeq.sortBy(_._1)} vs batch ${expected.toSeq.sortBy(_._1)}")
  }

  /** Survivors whose quality lands in (0.8, 0.9] — above the curation
    * floor but inside the classifier's NEGATIVE seed band (the base
    * corpus's survivors all score ≈1.16, and the both-classes training
    * guard rightly rejects a one-class seed set): n=30 tokens, 17
    * distinct, one stopword → quality = 17/30 + 0.3 − 1/30 ≈ 0.833. */
  private def lowQualitySurvivor(id: Long, tag: String, ts: String): (Long, String, String) = {
    val distinct = Seq("the", "of") ++ (0 until 15).map(i => s"${tag}_$i")
    val repeats = (0 until 13).map(i => s"${tag}_$i")
    (id, (distinct ++ repeats).mkString(" "), ts)
  }

  test("classifier-on finalization equals Curation.curate with the clf stage on") {
    val batch = (corpus ++ Seq(
      lowQualitySurvivor(3000L, "la", "2024-01-01T11:20:00"),
      lowQualitySurvivor(3001L, "lb", "2024-01-01T11:21:00")))
      .toDF("doc_id", "text", "ts")
    val cfg = Curation.Config(classifierFilter = true)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    val expected = Curation.curate(batch, "doc_id", "text", cfg)
      .collect().map(key).toSet
    assert(expected.nonEmpty)

    val src = Files.createTempDirectory("graft-scur-clf-src").toString
    batch.coalesce(1).write.mode("append").json(src)
    def stream() = spark.readStream.schema(schema).json(src)
    val candOut = Files.createTempDirectory("graft-scur-clf-cand").toString
    val q1 = StreamingCuration.qualifiedStream(stream(), "doc_id", "text", timeCol = "ts")
      .select("doc_id", "text", "quality_score", "predicted_lang")
      .writeStream.format("parquet").option("path", candOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-clf-ck1").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val dropOut = Files.createTempDirectory("graft-scur-clf-drop").toString
    val q2 = StreamingCuration.dropNotices(spark, stream(), "doc_id", "text",
      timeCol = "ts", horizonMinutes = 600)
      .writeStream.format("parquet").option("path", dropOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-clf-ck2").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q1.stop()
    q2.awaitTermination(120000); q2.stop()

    val candSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("quality_score", DoubleType),
      StructField("predicted_lang", StringType)))
    val noticeSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("event_time", TimestampType),
      StructField("matched_doc_id", LongType)))
    val curated = StreamingCuration.curatedFromSinks(
      spark.read.schema(candSchema).parquet(candOut),
      spark.read.schema(noticeSchema).parquet(dropOut), "doc_id", cfg)
      .collect().map(key).toSet
    assert(curated === expected,
      s"streamed ${curated.toSeq.sortBy(_._1)} vs batch ${expected.toSeq.sortBy(_._1)}")
  }

  test("ALL-stages finalization (trim + LM + classifier) equals the batch pipeline") {
    // the maximal composition: exercises the multi-stage checkpoint
    // plumbing and column preservation (perplexity + clf_prob + trimmed
    // text all surviving to the output) — each stage's cross-engine
    // semantics is already oracle-gated pairwise
    val passage = Seq("the", "of") ++ (0 until 12).map(i => s"q_$i")
    val extra = Seq(
      (2000L, (passage ++ (0 until 26).map(i => s"ya_$i")).mkString(" "),
        "2024-01-01T11:10:00"),
      (2001L, (passage ++ (0 until 26).map(i => s"yb_$i")).mkString(" "),
        "2024-01-01T11:11:00"))
    val batch = (corpus ++ extra ++ Seq(
      lowQualitySurvivor(3100L, "lc", "2024-01-01T11:30:00"),
      lowQualitySurvivor(3101L, "ld", "2024-01-01T11:31:00")))
      .toDF("doc_id", "text", "ts")
    val cfg = Curation.Config(trimSpans = true, perplexityFilter = true,
      perplexityKeepPercent = 85, classifierFilter = true, clfMinProb = 0.000001)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getString(6), r.getLong(7))
    val expected = Curation.curate(batch, "doc_id", "text", cfg)
      .collect().map(key).toSet
    assert(expected.nonEmpty)
    assert(expected.exists(_._8 > 0), "span stage must trim something")

    val src = Files.createTempDirectory("graft-scur-all-src").toString
    batch.coalesce(1).write.mode("append").json(src)
    def stream() = spark.readStream.schema(schema).json(src)
    val candOut = Files.createTempDirectory("graft-scur-all-cand").toString
    val q1 = StreamingCuration.qualifiedStream(stream(), "doc_id", "text", timeCol = "ts")
      .select("doc_id", "text", "quality_score", "predicted_lang")
      .writeStream.format("parquet").option("path", candOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-all-ck1").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val dropOut = Files.createTempDirectory("graft-scur-all-drop").toString
    val q2 = StreamingCuration.dropNotices(spark, stream(), "doc_id", "text",
      timeCol = "ts", horizonMinutes = 600)
      .writeStream.format("parquet").option("path", dropOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-all-ck2").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q1.stop()
    q2.awaitTermination(120000); q2.stop()

    val candSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("quality_score", DoubleType),
      StructField("predicted_lang", StringType)))
    val noticeSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("event_time", TimestampType),
      StructField("matched_doc_id", LongType)))
    val curated = StreamingCuration.curatedFromSinks(
      spark.read.schema(candSchema).parquet(candOut),
      spark.read.schema(noticeSchema).parquet(dropOut), "doc_id", cfg)
      .collect().map(key).toSet
    assert(curated === expected,
      s"streamed ${curated.toSeq.sortBy(_._1)} vs batch ${expected.toSeq.sortBy(_._1)}")
  }

  test("trim-on finalization equals Curation.curate with the span stage on") {
    // two extra survivors sharing a 14-token passage (7 of 33 8-shingles
    // → Jaccard ≈ 0.12, far below the 0.5 near-dup cut, so BOTH survive
    // document-level dedup and only the span stage touches them: the
    // max-id side loses the passage occurrence)
    val passage = Seq("the", "of") ++ (0 until 12).map(i => s"p_$i")
    val extra = Seq(
      (1000L, (passage ++ (0 until 26).map(i => s"xa_$i")).mkString(" "),
        "2024-01-01T11:00:00"),
      (1001L, (passage ++ (0 until 26).map(i => s"xb_$i")).mkString(" "),
        "2024-01-01T11:01:00"))
    val batch = (corpus ++ extra).toDF("doc_id", "text", "ts")
    val cfg = Curation.Config(trimSpans = true)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
        r.getString(4), r.getLong(5))
    val expected = Curation.curate(batch, "doc_id", "text", cfg)
      .collect().map(key).toSet
    assert(expected.exists(_._6 > 0),
      "fixture must plant a trimmable cross-survivor span")
    assert(expected.exists(t => t._1 == 1001L && t._6 == passage.size.toLong),
      "the max-id passage occurrence is the one trimmed")

    val src = Files.createTempDirectory("graft-scur-trim-src").toString
    batch.coalesce(1).write.mode("append").json(src)
    def stream() = spark.readStream.schema(schema).json(src)
    // trim-on finalization needs the text through the candidate sink
    val candOut = Files.createTempDirectory("graft-scur-trim-cand").toString
    val q1 = StreamingCuration.qualifiedStream(stream(), "doc_id", "text", timeCol = "ts")
      .select("doc_id", "text", "quality_score", "predicted_lang")
      .writeStream.format("parquet").option("path", candOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-trim-ck1").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val dropOut = Files.createTempDirectory("graft-scur-trim-drop").toString
    val q2 = StreamingCuration.dropNotices(spark, stream(), "doc_id", "text",
      timeCol = "ts", horizonMinutes = 600)
      .writeStream.format("parquet").option("path", dropOut)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-trim-ck2").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q1.stop()
    q2.awaitTermination(120000); q2.stop()

    val candSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("quality_score", DoubleType),
      StructField("predicted_lang", StringType)))
    val noticeSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("event_time", TimestampType),
      StructField("matched_doc_id", LongType)))
    val curated = StreamingCuration.curatedFromSinks(
      spark.read.schema(candSchema).parquet(candOut),
      spark.read.schema(noticeSchema).parquet(dropOut), "doc_id", cfg)
      .collect().map(key).toSet
    assert(curated === expected,
      s"streamed ${curated.toSeq.sortBy(_._1)} vs batch ${expected.toSeq.sortBy(_._1)}")
  }
}
