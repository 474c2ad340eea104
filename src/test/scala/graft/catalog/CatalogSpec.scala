package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Exercises the catalog/DDL surface (SURVEY §2.A13-A21): CTAS, external
  * table over parquet LOCATION, VALUES view, drops, existence checks,
  * SHOW PARTITIONS, ANALYZE, stats helper. */
class CatalogSpec extends SparkSpecBase {

  test("CTAS + tableExists + listTables + drop (A13, A18, A19)") {
    spark.sql("DROP TABLE IF EXISTS ctas_demo")
    spark.sql(
      s"CREATE TABLE ctas_demo USING parquet AS SELECT * FROM parquet.`$sfDir/region.parquet`")
    assert(Catalog.tableExists(spark, "ctas_demo"))
    assert(Catalog.listTables(spark).contains("ctas_demo"))
    assert(Catalog.tableSchema(spark, "ctas_demo").fieldNames.contains("r_name"))
    val (rows, cols, sample) = Catalog.tableStats(spark, "ctas_demo")
    assert(rows === 5 && cols === 2 && sample.length === 5)
    spark.sql("DROP TABLE ctas_demo")
    assert(!Catalog.tableExists(spark, "ctas_demo"))
  }

  test("external partitioned table DDL + SHOW PARTITIONS + ANALYZE (A16, A20, A21)") {
    val dir = Files.createTempDirectory("graft-ext").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("ingestion_date",
        date_format(col("o_orderdate"), "yyyy").cast("string"))
      .write.mode("overwrite").partitionBy("ingestion_date").parquet(s"$dir/orders")
    spark.sql("DROP TABLE IF EXISTS ext_orders")
    spark.sql(
      s"""CREATE TABLE ext_orders (o_orderkey BIGINT, o_custkey BIGINT,
         |  o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP,
         |  o_orderpriority STRING, ingestion_date STRING)
         |USING parquet PARTITIONED BY (ingestion_date)
         |LOCATION '$dir/orders'""".stripMargin)
    spark.sql("MSCK REPAIR TABLE ext_orders")
    val parts = Catalog.showPartitions(spark, "ext_orders").collect().map(_.getString(0))
    assert(parts.length >= 5, parts.mkString(","))
    assert(parts.forall(_.startsWith("ingestion_date=")))
    // partition pruning: a filter on the partition col prunes the scan
    val plan = spark.table("ext_orders")
      .filter(col("ingestion_date") === "1997")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ingestion_date"), plan)
    Catalog.analyzeTable(spark, "ext_orders")
    val stats = spark.sql("DESCRIBE EXTENDED ext_orders")
      .filter(col("col_name") === "Statistics").collect()
    assert(stats.nonEmpty)
    spark.sql("DROP TABLE ext_orders")
  }

  test("inline VALUES view (A17) and temp view drop (A18)") {
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW env_view AS
        |SELECT * FROM VALUES ('dev', 1), ('prod', 2) AS t(env, pri)""".stripMargin)
    assert(spark.table("env_view").count() === 2)
    assert(Catalog.dropView(spark, "env_view"))
  }
}
