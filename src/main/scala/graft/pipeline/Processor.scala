package graft.pipeline

import scala.util.{Failure, Success, Try}

/** Job result metadata — ref base_processor.py:15-47 (JobResult /
  * ProcessingResult dataclasses). Driver-side only, never on the data
  * plane. */
case class JobResult(
    jobName: String,
    success: Boolean,
    durationSeconds: Double,
    recordsProcessed: Long,
    failedTables: Seq[String] = Seq.empty,
    error: Option[String] = None)

/** Template-method ETL processor — ref base_processor.py:64-109:
  * `_pre_process → _extract → _transform → _load → _post_process`
  * with wall-time measurement and failure capture.
  *
  * `I` is the stage's intermediate representation (the reference passes
  * a dict of pandas frames; we pass whatever the stage defines — for
  * Spark stages that's lazy DataFrames, so no materialization happens
  * between template steps).
  */
trait Processor[I] {
  def jobName: String

  def preProcess(): Unit = ()
  def extract(): I
  def transform(in: I): I = in
  def load(in: I): Long
  def postProcess(result: JobResult): Unit = ()

  /** ref base_processor.py:64-109. */
  final def run(): JobResult = {
    val t0 = System.nanoTime()
    val attempt = Try {
      preProcess()
      val loaded = load(transform(extract()))
      loaded
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val result = attempt match {
      case Success(n) => JobResult(jobName, success = true, secs, n)
      case Failure(e) =>
        JobResult(jobName, success = false, secs, 0, error = Some(e.toString))
    }
    postProcess(result)
    result
  }
}
