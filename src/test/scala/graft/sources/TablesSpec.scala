package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The events reader's timestamp contract: `ts` is an INSTANT (epoch
  * micros) identical under every physical layout the generator has
  * shipped AND under every session time zone — a naive-timestamp
  * layout read in a non-UTC session must not shift the data. */
class TablesSpec extends SparkSpecBase {

  test("events.ts is session-timezone-independent") {
    val utcMicros = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us"))
      .orderBy("us").limit(5).collect().map(_.getLong(0)).toSeq

    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    val nyMicros = Tables.events(ny, sfDir)
      .select(unix_micros(col("ts")).as("us"))
      .orderBy("us").limit(5).collect().map(_.getLong(0)).toSeq

    assert(utcMicros === nyMicros,
      s"a non-UTC session shifted events.ts: $utcMicros vs $nyMicros")
  }

  test("events.ts arrives as TimestampType with plausible 2024-era instants") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val bounds = df.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).collect()(0)
    // the generator writes 2024 data; a layout misread (ns-as-us, or a
    // double timezone shift compounding across reads) lands far outside
    val y2020 = 1577836800000000L
    val y2030 = 1893456000000000L
    assert(bounds.getLong(0) > y2020 && bounds.getLong(1) < y2030,
      s"events.ts instants out of range: $bounds")
  }
}
