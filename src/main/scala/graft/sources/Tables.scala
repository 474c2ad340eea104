package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical readers for the driver-generated testdata tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Design notes for scale:
  *   - Everything is a plain parquet scan → Catalyst gets full predicate
  *     pushdown + column pruning; callers must NOT cache or collect here.
  *   - `events.ts` is written as INT64 TIMESTAMP(NANOS) which Spark's
  *     vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it as
  *     a raw long (`spark.sql.legacy.parquet.nanosAsLong`) and convert
  *     ns → µs with integer division *inside the scan projection*, so the
  *     conversion stays in whole-stage codegen and costs one long div per
  *     row. Sub-microsecond precision is dropped, matching Spark's native
  *     TimestampType resolution.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => spark.read.parquet(path(dir, other))
    }

  /** events with `ts` as a proper TimestampType (µs).
    *
    * The nanosAsLong flag is set once per session and deliberately NOT
    * restored: Spark consults it again at every EXECUTION of an
    * events-derived plan (parquet footer → Catalyst conversion happens
    * per scan, not just at read-schema time), so a save/restore around
    * this read would make a later action on the returned DataFrame throw
    * PARQUET_TYPE_ILLEGAL. Scoped alternative for sessions that must not
    * carry the flag: run events queries in `spark.newSession()`. The
    * flag's only effect on unrelated reads is that other ns-timestamp
    * parquet also loads (as long) instead of erroring. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(key).forall(_ != "true")) spark.conf.set(key, "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view (idempotent) so SQL-text entry
    * points (SURVEY §2 A22) can run against the same relations the DuckDB
    * oracle sees. Views are lazy — no materialization happens here — but
    * creating them reads parquet footers, so registration is memoized
    * per (session, dir): repeated query invocations in one session pay
    * nothing. */
  private val registered =
    new java.util.WeakHashMap[SparkSession, String]()

  def registerAll(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      // keyed by the session OBJECT (weakly, so dropped sessions don't
      // pin memory) and tracking the LAST dir registered: switching a
      // session between sfDirs re-registers every time, so SQL-text
      // queries can never silently read a stale scale factor.
      if (registered.get(spark) != dir) {
        all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
      }
    }
}
