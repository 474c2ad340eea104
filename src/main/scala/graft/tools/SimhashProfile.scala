package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: decompose dd_simhash's wall time into its cost
  * regions — the signature pass (per-token md5 → 64 bit votes; the
  * round-13 suspect is the INTERPRETED higher-order vote fold, which
  * allocates a fresh 64-element array per token) vs banding vs the
  * bucket pair walk (collect_list buckets + per-pair interpreted
  * Hamming zips). The artifact behind the simhash plan audit.
  * `runMain graft.tools.SimhashProfile [sfDir]`. */
object SimhashProfile {
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
      println(f"$label%-34s ${ts.min}%.2f s (min of 2 warmed reps)")
    }
    import graft.operators.Dedup
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // 1. signature pass alone (tokenize + md5 votes -> 64-bit array)
    val sig = docs
      .select(col("doc_id").as("doc"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(array_remove(col("toks"), "")) >= 1)
      .select(col("doc"),
        graft.functions.TextFunctions.simhashBits(col("toks"), 64).as("sig"))
    time("signature (array form)") { sink(sig) }

    // 2. signature + banding
    time("banded (array form)") {
      sink(Dedup.simhashBanded(docs, "doc_id", "text"))
    }

    // 3. full pair walk (the dd_simhash gate body)
    time("pairs (array form, capped)") {
      sink(Dedup.simhashPairs(docs, "doc_id", "text"))
    }
  }
}
