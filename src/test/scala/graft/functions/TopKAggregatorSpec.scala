package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpecBase}
import graft.sources.Tables

class TopKAggregatorSpec extends SparkSpecBase {

  test("typed top-k aggregation matches the window-function formulation") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"), col("event_id"))
      .as[(Long, Double, Long)]

    val agg = new TopKAggregator(3).toColumn
    val topk = ev.groupByKey(_._1)
      .mapValues(e => (e._2, e._3))
      .agg(agg.name("top"))
      .flatMap { case (user, top) => top.map(t => (user, t._2, t._1)) }
      .toDF("user_id", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // window formulation (the plan this Aggregator avoids at scale)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id").desc)
    val viaWindow = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("user_id", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(topk === viaWindow)
  }

  test("partial aggregation appears in the plan (map-side top-k before the shuffle)") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"), col("event_id"))
      .as[(Long, Double, Long)]
    val plan = ev.groupByKey(_._1)
      .mapValues(e => (e._2, e._3))
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .queryExecution.executedPlan.toString
    // must match the aggregator's OWN partial mode — a generic
    // "partial_" would be satisfied by any partial aggregate and could
    // never catch this Aggregator losing map-side combining
    assert(plan.toLowerCase.contains("partial_topkaggregator"), plan)
  }
}
