package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{RelationalQueries, TrainingDataQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from
  * SURVEY.md §2 to a `(spark, sfDir) => DataFrame`; `oracleSql` carries
  * the DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary aggregate (scan → filter → hash agg → sort). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TrainingDataQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TrainingDataQueries.oracles
}
