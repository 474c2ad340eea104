package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class MaxMultiplicityExprSpec extends SparkSpecBase {

  import spark.implicits._

  test("graft_maxmult equals the sorted-run HOF formulation on random gram arrays") {
    graft.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(0x3A95)
    val rows = (1 to 400).map { i =>
      val n = rnd.nextInt(60)
      (i.toLong, (0 until n).map(_ => s"g${rnd.nextInt(12)}"))
    }
    val df = rows.toDF("id", "grams")
    val out = df.select(col("id"),
        call_function("graft_maxmult", col("grams")).as("native"),
        graft.operators.TextAnalysis.topRunCountHof(col("grams")).as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getLong(0)}"))
    // and against a driver-side reference
    val ref = rows.map { case (i, gs) =>
      i -> (if (gs.isEmpty) 0L else gs.groupBy(identity).values.map(_.size).max.toLong)
    }.toMap
    out.foreach(r => assert(r.getLong(1) === ref(r.getLong(0))))
  }

  test("graft_maxmult: empty array is 0, null array is null, null elements skipped") {
    graft.GraftExtensions.register(spark)
    val df = Seq(
      (1L, Some(Seq[String]())),
      (2L, None),
      (3L, Some(Seq("a", "a", "b")))).toDF("id", "grams")
    val out = df.select(col("id"),
        call_function("graft_maxmult", col("grams")).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) === Some(0L))
    assert(out(2L) === None)
    assert(out(3L) === Some(2L))
    val withNullElem = spark.sql(
      "SELECT graft_maxmult(array('x', CAST(NULL AS STRING), 'x', 'x')) AS m")
      .collect()(0).getLong(0)
    assert(withNullElem === 3L)
  }
}
