package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpecBase
import graft.sources.Tables

class SkewSpec extends SparkSpecBase {

  test("saltedAggregate equals direct groupBy for algebraic aggregates") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy("event_type").agg(
      sum(col("value").cast(DecimalType(18, 2))).as("total"),
      count(col("value")).as("n"),
      min(col("value")).as("lo"),
      max(col("value")).as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getDecimal(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    val salted = Skew.saltedAggregate(ev, Seq("event_type"), Map(
      "total" -> (col("value").cast(DecimalType(18, 2)), "sum"),
      "n" -> (col("value"), "count"),
      "lo" -> (col("value"), "min"),
      "hi" -> (col("value"), "max")), saltFactor = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDecimal(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (t, n, lo, hi)) =>
      val (dt, dn, dlo, dhi) = direct(k)
      assert(t.compareTo(dt) === 0, s"$k total")
      assert(n === dn && lo === dlo && hi === dhi, k)
    }
  }

  test("saltedJoin equals plain join") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))
    val direct = ev.join(users, "user_id")
      .select("event_id", "user_tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(ev, users, "user_id", saltFactor = 4)
      .select("event_id", "user_tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === direct)
  }
}
