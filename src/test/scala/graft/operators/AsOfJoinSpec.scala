package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class AsOfJoinSpec extends SparkSpecBase {

  test("backward as-of join: latest right at-or-before each left, per key") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, 50L), // key 1, ts 50 → right ts 40
      (101L, 1L, 10L), // before any right → null
      (102L, 1L, 40L), // boundary: inclusive → right at 40
      (103L, 2L, 99L)) // other key → right 90
      .toDF("lid", "k", "ts")
    val right = Seq(
      (200L, 1L, 20L, 2.0),
      (201L, 1L, 40L, 4.0),
      (202L, 2L, 90L, 9.0),
      (203L, 9L, 1L, 1.0)) // unrelated key
      .toDF("rid", "k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rid")
      .select(col("lid"), col("asof.rid").as("rid"), col("asof.v").as("v"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (100L, Some(201L), Some(4.0)),
      (101L, None, None),
      (102L, Some(201L), Some(4.0)),
      (103L, Some(202L), Some(9.0))))
  }

  test("ties on ts resolve to the maximum tie column, deterministically") {
    import spark.implicits._
    val left = Seq((1L, 1L, 50L)).toDF("lid", "k", "ts")
    val right = Seq(
      (300L, 1L, 50L, 1.0),
      (301L, 1L, 50L, 2.0), // same ts, higher rid wins
      (299L, 1L, 49L, 9.0))
      .toDF("rid", "k", "ts", "v")
    val rid = AsOfJoin.backward(left, right, "k", "ts", "rid")
      .select(col("asof.rid")).collect().head.getLong(0)
    assert(rid === 301L)
  }

  test("the plan is one union-window shuffle, not a join explosion") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, (i % 5).toLong, i.toLong * 10))
      .toDF("lid", "k", "ts")
    val right = (1 to 100).map(i => (i.toLong + 1000, (i % 5).toLong, i.toLong * 7))
      .toDF("rid", "k", "ts")
    val plan = AsOfJoin.backward(left, right, "k", "ts", "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // no join operator at all
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"$exchanges exchanges:\n$plan")
  }
}
