package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

import scala.reflect.io.Directory

/** The persisted, partition-pruned hyperplane bucket index — the LSH
  * sibling of IvfPqIndexSpec, same proof pattern: (1) the probe set is
  * a PartitionFilter in the executed plan, (2) physically deleting
  * every unprobed bucket's files leaves the search byte-identical. */
class LshIndexSpec extends SparkSpecBase {

  private val dim = 64
  private val nBits = 4
  private def emb = Tables.embeddings(spark, sfDir)
  private def corpus = emb.filter(col("vec_id") =!= 0)
  private def query = emb.filter(col("vec_id") === 0)
    .select(col("embedding").as("qvec"))

  private def buildIndex(): String = {
    val path = Files.createTempDirectory("graft-lsh-spec").toString
    SimilaritySearch.buildLshBucketIndex(
      corpus, "vec_id", "embedding", path, dim = dim, nBits = nBits)
    path
  }

  private def qv: Array[Double] = query
    .select(graft.functions.VectorFunctions.asDoubles(col("qvec")).as("q"))
    .take(1).head.getSeq[Double](0).toArray

  test("probe set is the query bucket plus its 1-bit flips; probeBits=0 is the bucket alone") {
    val p1 = SimilaritySearch.probeBuckets(qv, dim, nBits, probeBits = 1)
    assert(p1.size === nBits + 1)
    assert(p1.forall(b => b.length === nBits && b.forall(c => c == '0' || c == '1')))
    val own = SimilaritySearch.probeBuckets(qv, dim, nBits, probeBits = 0)
    assert(own === Seq(p1.head))
    // every flip differs from the own bucket in exactly one position
    p1.tail.foreach { f =>
      assert(f.zip(p1.head).count { case (a, b) => a != b } === 1)
    }
  }

  test("index search equals exact cosine top-k over the probed buckets' members") {
    val path = buildIndex()
    val got = SimilaritySearch.lshTopKFromIndex(
      spark, path, query, dim = dim, nBits = nBits, k = 10)
      .collect().toSeq
    // independent reference: bucket every corpus vector with the SAME
    // plan expression, filter to the probe set, exact cosine top-k
    val probed = SimilaritySearch.probeBuckets(qv, dim, nBits, probeBits = 1)
    val want = SimilaritySearch.lshBuckets(
      corpus, "vec_id", "embedding", dim = dim, nBits = nBits)
      .filter(col("bucket").isin(probed: _*))
      .select(col("id").cast("long").as("vec_id"))
      .join(corpus.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding")), "vec_id")
      .select(col("vec_id").as("cand_id"), col("embedding"))
      .crossJoin(broadcast(query))
      .select(col("cand_id"), graft.functions.VectorFunctions.cosine(
        graft.functions.VectorFunctions.asDoubles(col("embedding")),
        graft.functions.VectorFunctions.asDoubles(col("qvec"))).as("cos"))
      .orderBy(col("cos").desc, col("cand_id").asc)
      .limit(10).collect().toSeq
    assert(got.map(_.getLong(0)) === want.map(_.getLong(0)))
    assert(got.map(_.getDouble(1)) === want.map(_.getDouble(1)),
      "stored norms must reproduce the exact cosine bit-for-bit")
  }

  test("the probe restriction is a PartitionFilter on the bucket column") {
    val path = buildIndex()
    val df = SimilaritySearch.lshTopKFromIndex(
      spark, path, query, dim = dim, nBits = nBits, k = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains(path)).toSeq
    assert(indexScans.nonEmpty, s"no scan over the index path in:\n$plan")
    indexScans.foreach { l =>
      assert("""PartitionFilters: \[bucket#\d+ IN""".r.findFirstIn(l).isDefined,
        s"probe must reach the partition-pruning layer:\n$l")
      assert(l.contains("DataFilters: []"),
        s"probe must be pruning-only:\n$l")
    }
  }

  test("wrong-knob search against the persisted build meta fails loudly") {
    val path = buildIndex()
    // a different seed (or dim) computes same-LENGTH bucket strings and
    // would silently probe the wrong partitions — the sidecar check
    // must turn that into an error, not plausible-but-wrong neighbors
    val wrongSeed = intercept[IllegalArgumentException] {
      SimilaritySearch.lshTopKFromIndex(
        spark, path, query, dim = dim, nBits = nBits, k = 5, seed = 123L)
    }
    assert(wrongSeed.getMessage.contains("built with"))
    intercept[IllegalArgumentException] {
      SimilaritySearch.lshTopKFromIndex(
        spark, path, query, dim = 32, nBits = nBits, k = 5)
    }
    // matching knobs still search fine
    assert(SimilaritySearch.lshTopKFromIndex(
      spark, path, query, dim = dim, nBits = nBits, k = 5).count() === 5)
  }

  test("deleting every unprobed bucket's files leaves the search unchanged") {
    val path = buildIndex()
    val probed = SimilaritySearch.probeBuckets(qv, dim, nBits, probeBits = 1).toSet
    val before = SimilaritySearch.lshTopKFromIndex(
      spark, path, query, dim = dim, nBits = nBits, k = 10).collect().toSeq
    val bucketDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    val unprobed = bucketDirs.filterNot(f =>
      probed.contains(f.getName.stripPrefix("bucket=")))
    assert(unprobed.nonEmpty, "fixture must populate unprobed buckets")
    unprobed.foreach(d => assert(new Directory(d).deleteRecursively()))
    val after = SimilaritySearch.lshTopKFromIndex(
      spark, path, query, dim = dim, nBits = nBits, k = 10).collect().toSeq
    assert(after === before)
  }

  test("multi-query batch search equals the single-query search, query by query") {
    val path = buildIndex()
    val queries = emb.filter(col("vec_id") === 0 || col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = SimilaritySearch.lshTopKBatchFromIndex(
      spark, path, queries, "qid", "qvec", dim = dim, nBits = nBits, k = 10)
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    Seq(0L, 7L).foreach { qid =>
      val one = emb.filter(col("vec_id") === qid)
        .select(col("embedding").as("qvec"))
      val single = SimilaritySearch.lshTopKFromIndex(
        spark, path, one, dim = dim, nBits = nBits, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got(qid) === single, s"qid $qid")
    }
    // the serving plan keeps the index property: probed-buckets-only at
    // the partition-pruning layer
    batch.collect()
    val plan = batch.queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains(path)).toSeq
    assert(indexScans.nonEmpty, s"no scan over the index path in:\n$plan")
    indexScans.foreach { l =>
      assert("""PartitionFilters: \[bucket#\d+ IN \(""".r.findFirstIn(l).isDefined,
        s"probe restriction must prune partitions in the batch plan:\n$l")
    }
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
