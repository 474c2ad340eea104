package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: decompose a gate's wall-clock into its Spark JOB
  * structure — `runMain graft.tools.FloorProfile gate1,gate2 [sfDir]`.
  *
  * The last 4 weak gates (q23, q24, ds_token_budget_incremental,
  * ta_bpe_encode — round-15 verdict item 6) are all 1.3–1.4 s absolute
  * against sub-0.4 s DuckDB: the hypothesis is per-job scheduling floor
  * (k jobs × ~100 ms local-mode job overhead), not data work. This tool
  * makes that adjudicable: per rep it reports the number of jobs, each
  * job's wall ms, the summed in-job task time, and the gap between the
  * gate's wall-clock and the jobs' union span (driver-side
  * plan/analysis cost). A gate whose wall ≈ Σ job walls with ≤100 ms
  * jobs and whose task-time sum is a small fraction is FLOOR-BOUND:
  * on a real cluster the same plan amortizes (jobs don't get more
  * numerous with data; each job's task time grows instead). */
object FloorProfile {
  def main(args: Array[String]): Unit = {
    val gates = (if (args.nonEmpty) args(0) else "q23_percentiles").split(',')
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // job-structure listener: (jobId -> (t_start, t_end)), task time per job
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val jobSpan = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long)]
    val stageTaskMs = scala.collection.concurrent.TrieMap.empty[Int, (Long, Int)]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach(t0 => jobSpan(e.jobId) = (t0, e.time))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageTaskMs(si.stageId) =
          (si.taskMetrics.executorRunTime, si.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def run(name: String): Unit =
      graft.SparkEntry.queries.getOrElse(name, graft.Bench.benchOnly(name))(spark, dir)
        .write.format("noop").mode("overwrite").save()

    gates.foreach { g =>
      run(g) // warm: JIT, parquet footers, codegen cache
      for (rep <- 1 to 3) {
        jobSpan.clear(); stageTaskMs.clear()
        val t0 = System.nanoTime()
        run(g)
        val wallMs = (System.nanoTime() - t0) / 1e6
        // drain listener-bus lag before reading the maps (the public
        // bus drain is private[spark]; events for a completed local job
        // land within ms — a short settle is enough for a diagnostic)
        Thread.sleep(200)
        val spans = jobSpan.values.toSeq.sortBy(_._1)
        val jobWalls = spans.map { case (a, b) => b - a }
        // union span: jobs can overlap under AQE; sum double-counts
        val union =
          if (spans.isEmpty) 0L
          else spans.foldLeft((0L, Long.MinValue)) { case ((acc, hi), (a, b)) =>
            (acc + math.max(0L, b - math.max(a, hi)), math.max(hi, b))
          }._1
        val taskMs = stageTaskMs.values.map(_._1).sum
        val nTasks = stageTaskMs.values.map(_._2).sum
        println(f"$g rep$rep: wall=${wallMs}%.0fms jobs=${jobWalls.size} " +
          f"job_union=${union}ms sum_job_walls=${jobWalls.sum}ms " +
          f"driver_gap=${wallMs - union}%.0fms task_ms=$taskMs tasks=$nTasks " +
          s"job_walls_ms=${jobWalls.mkString("[", ",", "]")}")
      }
    }
    spark.stop()
  }
}
