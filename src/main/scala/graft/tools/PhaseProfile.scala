package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: split a gate's wall into CONSTRUCT (the queries-map
  * function — any eager training/collect jobs included), PLAN (analysis
  * + optimization + physical planning of the returned frame), and EXEC
  * (noop write) — `runMain graft.tools.PhaseProfile gate1,gate2 [sfDir]`.
  * Also reports Janino compile count per phase (codegen-cache misses). */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val gates = (if (args.nonEmpty) args(0) else "ss_ann_pq").split(',')
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cg(): Long =
      try org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      catch { case _: Throwable => -1L }
    gates.foreach { g =>
      val fn = graft.SparkEntry.queries.getOrElse(g, graft.Bench.benchOnly(g))
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime(); val c0 = cg()
        val df = fn(spark, dir)
        val t1 = System.nanoTime(); val c1 = cg()
        df.queryExecution.executedPlan // force analysis->physical
        val t2 = System.nanoTime(); val c2 = cg()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime(); val c3 = cg()
        println(f"$g rep$rep: construct=${(t1 - t0) / 1e6}%.0fms (cg ${c1 - c0}) " +
          f"plan=${(t2 - t1) / 1e6}%.0fms (cg ${c2 - c1}) " +
          f"exec=${(t3 - t2) / 1e6}%.0fms (cg ${c3 - c2})")
      }
    }
    spark.stop()
  }
}
