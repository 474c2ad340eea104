package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: decompose dd_spans' wall time into its two cost
  * regions — the posting projection (tokenize → positional shingles →
  * shingle hash; the md5 term is the deliberate cross-engine
  * verifiability cost, see TextFunctions.baseHash) vs the match join +
  * island fold. The artifact behind the standing plan audit of the
  * span family's >2×-DuckDB grade: if the md5 posting pass dominates,
  * the residual is the verifiability trade, not a plan defect —
  * production corpora without a DuckDB gate pass `fast = true`.
  * `runMain graft.tools.SpanProfile [sfDir]`. */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s ${ts.min}%.2f s (min of 2 warmed reps)")
    }
    import graft.operators.Dedup
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("sharedSpans (md5, gated)") {
      noop(Dedup.sharedSpans(docs, "doc_id", "text"))
    }
    time("sharedSpans (fast xxhash)") {
      noop(Dedup.sharedSpans(docs, "doc_id", "text", fast = true))
    }
    time("posting only (md5)") {
      noop(Dedup.positionalPosting(docs, "doc_id", "text",
        Dedup.DefaultSpanK, Some(Dedup.DefaultMaxDocFreqFraction)))
    }
    time("posting only (fast)") {
      noop(Dedup.positionalPosting(docs, "doc_id", "text",
        Dedup.DefaultSpanK, Some(Dedup.DefaultMaxDocFreqFraction), fast = true))
    }
    // decompose the non-posting half: raw posting pin → guard →
    // guarded pin → self-join matches → (pair, diag) fold
    time("matches (join, md5)") {
      noop(Dedup.selfSpanMatchesForProfile(docs, "doc_id", "text"))
    }
    locally {
      // fold alone, from pre-materialized matches (parquet round-trip
      // so the join cost is fully excluded)
      val p = java.nio.file.Files.createTempDirectory("graft-spanprof").toString
      Dedup.selfSpanMatchesForProfile(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(p)
      val m = spark.read.parquet(p)
      time("fold only (pinned matches)") {
        noop(Dedup.spanFoldForProfile(m))
      }
    }
    spark.stop()
  }
}
