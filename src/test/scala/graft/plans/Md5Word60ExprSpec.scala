package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Codegen lock for the native md5 key: the whole point of
  * `graft_md5w60` is keeping the span/minhash posting projection inside
  * WholeStageCodegen with no hex-string round trip — value parity with
  * the composed conv(substring(md5)) form is in
  * RandomizedDifferentialSpec. */
class Md5Word60ExprSpec extends SparkSpecBase {

  test("graft_md5w60 evaluates inside a WholeStageCodegen span") {
    // a parquet-backed column — a local literal relation constant-folds
    // the md5 at planning and leaves only a LocalTableScan
    val df = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.functions.TextFunctions.shingleKey(col("text")).as("h"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val exprLines = plan.linesIterator.filter(_.contains("graft_md5w60")).toSeq
    assert(exprLines.nonEmpty, s"expression missing from:\n$plan")
    exprLines.foreach(l => assert(l.trim.matches("""^[+\-:\s]*\*\(\d+\).*"""),
      s"graft_md5w60 fell out of codegen:\n$l"))
  }

  test("null string yields null key (nullIntolerant contract)") {
    import spark.implicits._
    val rows = Seq(Some("a"), None).toDF("s")
      .select(graft.functions.TextFunctions.shingleKey(col("s")).as("h"))
      .collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
