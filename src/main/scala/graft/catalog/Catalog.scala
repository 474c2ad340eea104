package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Catalog/introspection surface — ref duckdb_client.py:192-279 and
  * trino_client.py:144-214 (exists/list/schema/partitions/analyze). All
  * thin wrappers over `spark.catalog` / SQL, kept as one object so the
  * reference's client API has a single Spark counterpart.
  */
object Catalog {

  /** ref duckdb_client.py:192-210. */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** ref duckdb_client.py:231-249. */
  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  /** ref duckdb_client.py:251-269 (information_schema column listing). */
  def tableSchema(spark: SparkSession, name: String): StructType =
    spark.table(name).schema

  /** ref trino_client.py:198-204. */
  def showPartitions(spark: SparkSession, name: String): DataFrame =
    spark.sql(s"SHOW PARTITIONS $name")

  /** ref duckdb_client.py:271-279 / trino_client.py:206-214. Feeds the
    * cost-based optimizer; on a real cluster run this after large loads
    * so join planning sees fresh stats. */
  def analyzeTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")

  /** ref duckdb_client.py:172-190. */
  def dropView(spark: SparkSession, name: String): Boolean =
    spark.catalog.dropTempView(name)

  /** Table stats helper — ref duckdb_client.py:360-382: row count,
    * column count, 5-row sample. */
  def tableStats(spark: SparkSession, name: String): (Long, Int, Array[org.apache.spark.sql.Row]) = {
    val df = spark.table(name)
    (df.count(), df.columns.length, df.limit(5).collect())
  }
}
