package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

import scala.reflect.io.Directory

/** The persisted, partition-pruned IVF-PQ index — the storage-layer
  * closing of the round-8 gap where probed-cell restriction was a
  * filter over a full corpus scan. Proof pattern mirrors MergeSpec's
  * scd2MergeDelta: (1) the probe restriction appears as a
  * PartitionFilter in the executed plan, (2) physically deleting an
  * unprobed cell's files leaves the search result byte-identical —
  * the files were never going to be read. */
class IvfPqIndexSpec extends SparkSpecBase {

  private val dim = 64
  private def emb = Tables.embeddings(spark, sfDir)
  private def corpus = emb.filter(col("vec_id") =!= 0)
  private def query = emb.filter(col("vec_id") === 0)
    .select(col("embedding").as("qvec"))

  private def buildIndex(): (String, IvfPqModel) = {
    val path = Files.createTempDirectory("graft-ivfpq-spec").toString
    val model = ProductQuantization.buildIvfPqIndex(
      corpus, "vec_id", "embedding", path,
      dim = dim, nCells = 16, coarseIters = 2, m = 8, k = 16, iters = 1)
    (path, model)
  }

  test("index search matches ivfPqTopK bit-identically at the same knobs") {
    val (path, model) = buildIndex()
    val fromIndex = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10, model = Some(model))
      .collect().toSeq
    val direct = ProductQuantization.ivfPqTopK(
      corpus, "vec_id", "embedding", query,
      dim = dim, nCells = 16, nProbe = 4, coarseIters = 2,
      m = 8, k = 16, iters = 1, rerank = 100, topK = 10)
      .collect().toSeq
    assert(fromIndex === direct)
    assert(fromIndex.size === 10)
  }

  test("the probe restriction is a PartitionFilter — only probed cells' files are scanned") {
    val (path, model) = buildIndex()
    val df = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10, model = Some(model))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the assertion scopes to the INDEX scan line (the one over `path`);
    // the exact-re-rank corpus scans are unpartitioned and legitimately
    // carry empty partition filters
    val indexScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains(path))
      .toSeq
    assert(indexScans.nonEmpty, s"no scan over the index path in:\n$plan")
    indexScans.foreach { l =>
      assert("""PartitionFilters: \[cell#\d+L IN \(""".r.findFirstIn(l).isDefined,
        s"probe restriction must reach the partition-pruning layer:\n$l")
      assert(l.contains("DataFilters: []"),
        s"probe restriction must be pruning-only, not a post-scan data filter:\n$l")
    }
  }

  test("deleting an unprobed cell's files leaves the search result unchanged") {
    val (path, model) = buildIndex()
    val qv = query.select(
      graft.functions.VectorFunctions.asDoubles(col("qvec")).as("q"))
      .take(1).head.getSeq[Double](0).toArray
    val probed = ProductQuantization.probeCells(model.centroids, qv, 4).toSet
    val before = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10, model = Some(model))
      .collect().toSeq

    // physically remove every cell directory the probe does NOT select —
    // if the search ever listed or opened them, it would now throw or
    // change its answer
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val unprobed = cellDirs.filterNot(f =>
      probed.contains(f.getName.stripPrefix("cell=").toLong))
    assert(unprobed.nonEmpty, "fixture must populate unprobed cells")
    unprobed.foreach(d => assert(new Directory(d).deleteRecursively()))

    val after = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10, model = Some(model))
      .collect().toSeq
    assert(after === before,
      "search over the probed-cells-only remnant must be byte-identical")
  }

  test("append encodes the delta under the frozen model and search sees the union") {
    // build on the even-id half, append the odd-id half; the result
    // must equal building codes for the UNION under the SAME model —
    // the frozen-model contract (no silent re-route of existing cells)
    val half = corpus.filter(pmod(col("vec_id"), lit(2)) === 0)
    val rest = corpus.filter(pmod(col("vec_id"), lit(2)) =!= 0)
    val path = Files.createTempDirectory("graft-ivfpq-append").toString
    val model = ProductQuantization.buildIvfPqIndex(
      half, "vec_id", "embedding", path,
      dim = dim, nCells = 16, coarseIters = 2, m = 8, k = 16, iters = 1)
    val loaded = ProductQuantization.appendToIvfPqIndex(
      rest, "vec_id", "embedding", path)
    assert(loaded.centroids.map(_._1) === model.centroids.map(_._1))

    val afterAppend = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 16, rerank = 100, topK = 10, model = Some(model))
      .collect().toSeq
    // reference: encode the whole corpus under the SAME half-trained
    // model via the stored-codes search (nProbe = nCells → no pruning
    // on either side, so only the encode provenance differs)
    val enc = ProductQuantization.encode(
      corpus, "vec_id", "embedding", model.codebooks, dim)
    val reference = ProductQuantization.pqTopKFromCodes(
      enc, corpus, "vec_id", "embedding", query, model.codebooks,
      rerank = 100, topK = 10)
      .collect().toSeq
    assert(afterAppend === reference)
  }

  test("the persisted model round-trips exactly and the search needs only the index path") {
    val (path, built) = buildIndex()
    val loaded = IvfPqModel.load(path)
    assert(loaded.dim === built.dim)
    assert(loaded.centroids.map(_._1) === built.centroids.map(_._1))
    loaded.centroids.zip(built.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq)
    }
    assert(loaded.codebooks.size === built.codebooks.size)
    loaded.codebooks.zip(built.codebooks).foreach { case (la, lb) =>
      assert(la.map(_._1) === lb.map(_._1))
      la.zip(lb).foreach { case ((_, a), (_, b)) => assert(a.toSeq === b.toSeq) }
    }
    // model = None exercises the load-from-path default
    val viaLoad = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10)
      .collect().toSeq
    val viaBuilt = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10, model = Some(built))
      .collect().toSeq
    assert(viaLoad === viaBuilt)
  }

  test("compaction after appends preserves search results and shrinks the file count") {
    val (path, model) = buildIndex()
    // three appends leave every touched cell with several small files
    (1 to 3).foreach { i =>
      ProductQuantization.appendToIvfPqIndex(
        corpus.filter(pmod(col("vec_id"), lit(11)) === i)
          .withColumn("vec_id", col("vec_id") + i * 100000),
        "vec_id", "embedding", path)
    }
    val before = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10, model = Some(model)).collect().toSeq
    def fileCount = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.listFiles().count(f => f.getName.endsWith(".parquet"))).sum
    val filesBefore = fileCount
    val reports = graft.store.Compaction.compactTable(spark, path)
    assert(reports.nonEmpty, "appends must have produced compactable cells")
    assert(fileCount < filesBefore)
    // the model sidecar survives (underscore file at the root, outside
    // the partition dirs compaction rewrites)
    assert(IvfPqModel.load(path).dim === model.dim)
    val after = ProductQuantization.ivfPqTopKFromIndex(
      path, corpus, "vec_id", "embedding", query,
      nProbe = 4, rerank = 100, topK = 10, model = Some(model)).collect().toSeq
    assert(after === before)
  }

  test("indexHealth: i.i.d. appends don't flag drift; shifted-distribution appends do") {
    val (path, model) = buildIndex()
    // the build persists the drift baseline and it round-trips
    assert(model.trainQuantErr.exists(_ > 0))
    assert(IvfPqModel.load(path).trainQuantErr === model.trainQuantErr)

    // an i.i.d. batch (a slice of the training distribution, re-keyed):
    // quantization error under the frozen model matches the baseline
    val iid = corpus.filter(pmod(col("vec_id"), lit(7)) === 3)
      .withColumn("vec_id", col("vec_id") + 100000)
    ProductQuantization.appendToIvfPqIndex(iid, "vec_id", "embedding", path)
    val ok = ProductQuantization.indexHealth(
      path, iid, "vec_id", "embedding").collect().head
    assert(!ok.getAs[Boolean]("drift_flagged"),
      s"i.i.d. append must not flag drift: $ok")
    assert(ok.getAs[Double]("train_qerr") === model.trainQuantErr.get)
    assert(ok.getAs[Double]("occ_skew") >= 1.0)
    assert(ok.getAs[Long]("n_cells_occupied") >= 1L)

    // a planted-drift batch (every component shifted far outside the
    // training range): reconstruction error under the frozen codebooks
    // explodes, and the operator is told to rebuild
    val shifted = iid.withColumn("embedding",
      transform(col("embedding"), x => x + lit(5.0)))
    val bad = ProductQuantization.indexHealth(
      path, shifted, "vec_id", "embedding").collect().head
    assert(bad.getAs[Boolean]("drift_flagged"),
      s"shifted-distribution append must flag drift: $bad")
    assert(bad.getAs[Double]("delta_qerr") > 2 * bad.getAs[Double]("train_qerr"))
  }

  test("multi-query batch search equals the single-query search, query by query") {
    val (path, model) = buildIndex()
    val queries = emb.filter(col("vec_id") === 0 || col("vec_id") === 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = ProductQuantization.ivfPqTopKBatchFromIndex(
      path, corpus, "vec_id", "embedding", queries, "qid", "qvec",
      nProbe = 4, rerank = 100, topK = 10, model = Some(model))
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    Seq(0L, 5L).foreach { qid =>
      val one = emb.filter(col("vec_id") === qid)
        .select(col("embedding").as("qvec"))
      val single = ProductQuantization.ivfPqTopKFromIndex(
        path, corpus, "vec_id", "embedding", one,
        nProbe = 4, rerank = 100, topK = 10, model = Some(model))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got(qid) === single, s"qid $qid")
    }
    // the serving plan keeps the index properties: probed-cells-only at
    // the partition-pruning layer, all small sides broadcast
    batch.collect()
    val plan = batch.queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains(path)).toSeq
    assert(indexScans.nonEmpty, s"no scan over the index path in:\n$plan")
    indexScans.foreach { l =>
      assert("""PartitionFilters: \[cell#\d+L IN \(""".r.findFirstIn(l).isDefined,
        s"probe restriction must prune partitions in the batch plan:\n$l")
    }
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("an empty query batch returns an empty, correctly-shaped result") {
    val (path, model) = buildIndex()
    val none = emb.filter(col("vec_id") < 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = ProductQuantization.ivfPqTopKBatchFromIndex(
      path, corpus, "vec_id", "embedding", none, "qid", "qvec",
      model = Some(model))
    assert(out.columns.toSeq === Seq("qid", "vec_id", "cos", "rank"))
    assert(out.count() === 0)
  }

  test("duplicate qids in a serving batch fail loudly (ambiguous routing)") {
    val (path, model) = buildIndex()
    val dup = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    intercept[IllegalArgumentException] {
      ProductQuantization.ivfPqTopKBatchFromIndex(
        path, corpus, "vec_id", "embedding", dup.unionByName(dup),
        "qid", "qvec", model = Some(model))
    }
  }
}
