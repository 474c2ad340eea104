package graft.pipeline

import java.nio.file.Files

import graft.SparkSpecBase
import graft.fixtures.StreamProFixture
import graft.store.{LayerPaths, Storage}

class PipelineSpec extends SparkSpecBase {

  lazy val root: String = {
    val dir = Files.createTempDirectory("graft-pipeline")
    StreamProFixture.writeLanding(dir)
    dir.toString
  }

  lazy val results: Seq[JobResult] = Pipeline.run(spark,
    Pipeline.Config(root, StreamProFixture.IngestionDate))

  test("both stages succeed") {
    assert(results.length === 2)
    assert(results.forall(_.success), results.map(_.error).mkString("; "))
  }

  test("landing→raw copies bytes verbatim into the hive-partitioned raw layer") {
    results
    val paths = LayerPaths(root)
    val rawFiles = Storage.listObjects(spark,
      s"${paths.raw}/ingestion_date=${StreamProFixture.IngestionDate}")
    assert(rawFiles.size === 4)
    val landingCsv = Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/landing/users_${StreamProFixture.IngestionDate}.csv"))
    val rawCsv = Files.readAllBytes(java.nio.file.Paths.get(
      s"$root/raw/ingestion_date=${StreamProFixture.IngestionDate}/users_${StreamProFixture.IngestionDate}.csv"))
    assert(landingCsv.sameElements(rawCsv))
  }

  test("filename parser accepts date-suffixed drops and rejects others") {
    assert(LandingToRaw.parseFileName("users_2025-09-09.csv") ===
      Some(("users", "2025-09-09")))
    assert(LandingToRaw.parseFileName("user_events_2025-09-09.jsonl") ===
      Some(("user_events", "2025-09-09")))
    assert(LandingToRaw.parseFileName("README.md") === None)
    assert(LandingToRaw.parseFileName("users.csv") === None)
  }

  test("raw→trusted writes partitioned parquet with enforced registry schemas") {
    results
    val paths = LayerPaths(root)
    for (t <- SchemaRegistry.all) {
      val part = s"${paths.trustedTable(t.locationSuffix)}/ingestion_date=${StreamProFixture.IngestionDate}"
      assert(Storage.exists(spark, part), s"partition missing for ${t.name}")
      val df = spark.table(t.trustedName)
      // partition col present, typed string (hazard (f) in SURVEY.md §7)
      assert(df.columns.contains(SchemaRegistry.PartitionCol))
      val names = t.schema.fields.map(_.name).toSet
      assert(names.subsetOf(df.columns.toSet))
    }
    // date-like columns stay strings for lexicographic semantics
    val ev = spark.table("trusted_events")
    assert(ev.schema("timestamp").dataType.typeName === "string")
  }

  test("trusted row counts match fixture sizes") {
    results
    import graft.analytics.StreamProAnalytics
    val counts = StreamProAnalytics.tableCounts(spark)
    assert(counts("trusted_users") === 100)
    assert(counts("trusted_videos") === 20)
    assert(counts("trusted_devices") === 5)
    assert(counts("trusted_events") > 1000)
  }

  test("daily partitions accumulate: a second ingestion date does not clobber the first") {
    results
    val paths = LayerPaths(root)
    val d2 = "2025-09-10"
    // second day's drop: copy the first day's landing files under the new date
    for (t <- Seq("users", "videos", "devices")) {
      Storage.copyObject(spark,
        s"$root/landing/${t}_${StreamProFixture.IngestionDate}.csv",
        s"$root/landing/${t}_$d2.csv")
    }
    Storage.copyObject(spark,
      s"$root/landing/events_${StreamProFixture.IngestionDate}.jsonl",
      s"$root/landing/events_$d2.jsonl")
    val day2 = Pipeline.run(spark, Pipeline.Config(root, d2))
    assert(day2.forall(_.success))
    val users = spark.table("trusted_users") // registry-typed (string partition col)
    val dates = users.select("ingestion_date").distinct()
      .collect().map(_.getString(0)).sorted
    assert(dates === Array(StreamProFixture.IngestionDate, d2))
    // partition pruning still reads exactly one day
    assert(users.filter(org.apache.spark.sql.functions.col("ingestion_date") ===
      StreamProFixture.IngestionDate).count() === 100)
  }

  test("env config profiles select layer prefixes and root (ref config/{env}.env)") {
    val dir = Files.createTempDirectory("graft-profile")
    StreamProFixture.writeLanding(dir)
    val confDir = Files.createTempDirectory("graft-conf")
    Files.write(confDir.resolve("test.env"), java.util.Arrays.asList(
      "ENV=test",
      "# comment lines and blanks are ignored",
      "",
      s"MINIO_BUCKET=$dir",
      "LANDING_PREFIX=landing",
      "RAW_PREFIX=bronze",
      "TRUSTED_PREFIX=silver"))
    val cfg = Pipeline.Config.fromProfile(
      EnvProfile.load(confDir.toString, Some("test")), None,
      StreamProFixture.IngestionDate)
    assert(cfg.root === dir.toString)
    assert(cfg.rawPrefix === "bronze" && cfg.trustedPrefix === "silver")
    val rs = Pipeline.run(spark, cfg)
    assert(rs.forall(_.success), rs.map(_.error).mkString("; "))
    assert(Storage.exists(spark,
      s"$dir/bronze/ingestion_date=${StreamProFixture.IngestionDate}"))
    assert(Storage.exists(spark, s"$dir/silver"))
    // an explicit --root override beats the profile's bucket
    assert(Pipeline.Config.fromProfile(
      EnvProfile.load(confDir.toString, Some("test")), Some("/elsewhere"),
      "2025-09-09").root === "/elsewhere")
    // unknown env name falls back to dev.env, mirroring the reference
    Files.write(confDir.resolve("dev.env"),
      java.util.Arrays.asList("MINIO_BUCKET=/fallback"))
    assert(EnvProfile.load(confDir.toString, Some("staging"))("MINIO_BUCKET")
      === "/fallback")
  }

  test("per-table failure isolation: a broken table does not sink the others") {
    val dir = Files.createTempDirectory("graft-isolation")
    StreamProFixture.writeLanding(dir)
    // delete one raw input after stage 1 so stage 2 fails for that table only
    val paths = LayerPaths(dir.toString)
    new LandingToRaw(spark, paths, StreamProFixture.IngestionDate).run()
    Storage.deleteObject(spark, paths.rawKey(StreamProFixture.IngestionDate,
      s"videos_${StreamProFixture.IngestionDate}.csv"))
    val r = new RawToTrusted(spark, paths, StreamProFixture.IngestionDate)
      .runWithFailures()
    assert(!r.success)
    assert(r.failedTables === Seq("videos"))
    assert(r.recordsProcessed > 0) // other tables still loaded
  }
}
