package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: decompose dd_decontaminate's wall time —
  * train-posting scan vs eval-posting+guard vs the cross-corpus join +
  * containment aggregate, plus the raw match volume (the quantity the
  * broadcast/partial-agg question hinges on).
  * `runMain graft.tools.DecontProfile [sfDir]`. */
object DecontProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, dir)
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val evalC = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val n = Dedup.DefaultShingleN
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s ${ts.min}%.2f s (min of 2 warmed reps)")
    }
    def posting(df: org.apache.spark.sql.DataFrame, name: String, withSize: Boolean, fast: Boolean) = {
      val base = df
        .select(col("doc_id").as(name), tokens(col("text")).as("toks"))
        .select(col(name), shinglesFromTokens(col("toks"), n).as("sh"))
      if (withSize)
        base.select(col(name), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
          .select(col(name), col("n_sh"), shingleKey(col("s"), fast).as("h"))
      else base.select(col(name), explode(col("sh")).as("s"))
        .select(col(name), shingleKey(col("s"), fast).as("h"))
    }
    println(s"train docs=${train.count()}, eval docs=${evalC.count()}")
    val t = posting(train, "train_id", withSize = false, fast = false)
    val e = posting(evalC, "eval_id", withSize = true, fast = false)
    println(s"train postings=${t.count()}, eval postings=${e.count()}")
    println(s"raw h-matches=${t.join(e, "h").count()}")
    val s1 = train.select(col("doc_id").as("train_id"), tokens(col("text")).as("toks"))
    val s2 = s1.select(col("train_id"), shinglesFromTokens(col("toks"), n).as("sh"))
    val s3 = s2.select(col("train_id"), explode(col("sh")).as("s"))
    time("s1 tokenize only") { noop(s1) }
    time("s2 + shinglesFromTokens") { noop(s2) }
    time("s3 + explode") { noop(s3) }
    println(s3.queryExecution.executedPlan.toString.take(3000))
    val s3b = s2.localCheckpoint(false).select(col("train_id"), explode(col("sh")).as("s"))
    time("s3b explode after checkpoint") { noop(s3b) }
    val s3c = s2.select(col("train_id"), col("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("train_id"), explode(col("sh")).as("s"))
    time("s3c explode after filter") { noop(s3c) }
    val s3d = s2.select(col("train_id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
    time("s3d explode_outer + notnull") { noop(s3d) }
    println(s3d.queryExecution.executedPlan.toString.take(1200))
    time("train posting only (md5)") { noop(t) }
    time("train posting only (fast)") {
      noop(posting(train, "train_id", withSize = false, fast = true))
    }
    time("eval posting only (md5)") { noop(e) }
    time("full pairs (broadcast eval)") {
      noop(Dedup.contaminationPairs(train, evalC, "doc_id", "text"))
    }
    time("full pairs (shuffle join)") {
      noop(Dedup.contaminationPairs(train, evalC, "doc_id", "text",
        broadcastEval = false))
    }
    time("full pairs (fast, broadcast)") {
      noop(Dedup.contaminationPairs(train, evalC, "doc_id", "text", fast = true))
    }
    spark.stop()
  }
}
