package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.store.LayerPaths

/** Sequential two-stage medallion pipeline — ref src/jobs/pipeline.py:
  * 32-64. The reference shells out to subprocesses per stage; one
  * SparkSession running both stages in-process is the Spark-native
  * equivalent, with the same short-circuit on stage-1 failure
  * (pipeline.py:47).
  */
object Pipeline {

  case class Config(
      root: String,
      ingestionDate: String,
      enforceSchema: Boolean = true)

  def run(spark: SparkSession, cfg: Config): Seq[JobResult] = {
    val paths = LayerPaths(cfg.root)
    val r1 = new LandingToRaw(spark, paths, cfg.ingestionDate).run()
    if (!r1.success) return Seq(r1)
    val r2 = new RawToTrusted(spark, paths, cfg.ingestionDate, cfg.enforceSchema)
      .runWithFailures()
    Seq(r1, r2)
  }

  /** CLI — ref job_manager.py:19-38 (`--ingestion_date`, `--env`-like
    * root). */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val root = opts.getOrElse("root",
      sys.error("--root <dir with landing/> required"))
    val date = opts.getOrElse("ingestion_date",
      sys.error("--ingestion_date YYYY-MM-DD required"))
    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", "local[4]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        opts.getOrElse("shuffle_partitions", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = run(spark, Config(root, date))
    results.foreach(r => println(
      s"${r.jobName}: success=${r.success} records=${r.recordsProcessed} " +
        f"secs=${r.durationSeconds}%.2f failed=${r.failedTables.mkString(",")}"))
    spark.stop()
    if (!results.forall(_.success)) sys.exit(1)
  }
}
