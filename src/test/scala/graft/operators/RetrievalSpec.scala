package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

/** Hybrid RRF retrieval (Retrieval.hybridRrf): rank consistency with
  * the two single-system operators it fuses, exact fusion arithmetic,
  * candidate-list truncation semantics, and the bounded-window plan
  * shape (the corpus is only ever touched by distributed top-N). */
class RetrievalSpec extends SparkSpecBase {

  private val terms = Seq("vector", "stream", "window")

  private def gate() = Retrieval.hybridRrf(
    Tables.documents(spark, sfDir), "doc_id", "text",
    Tables.embeddings(spark, sfDir), "vec_id", "embedding",
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec")),
    terms, nDense = 50, nSparse = 50, rrfK = 60, topK = 10,
    excludeVecIds = Seq(0L))

  test("fused ranks agree with the single-system operators they truncate") {
    val rows = gate().collect()
    assert(rows.length == 10, s"topK=10 but got ${rows.length}")

    // Dense reference: brute-force exact cosine order (the ss_topk_cosine
    // operator), ranked 1..50 by (cos desc, id asc).
    val emb = Tables.embeddings(spark, sfDir)
    val denseRef = SimilaritySearch.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec")), 50)
      .collect().zipWithIndex
      .map { case (r, i) => r.getLong(0) -> (i + 1L) }.toMap

    // Sparse reference: bm25 order (the ss_bm25 operator), ranked 1..50.
    val sparseRef = TextAnalysis.bm25(
      Tables.documents(spark, sfDir), "doc_id", "text", terms)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(50)
      .collect().zipWithIndex
      .map { case (r, i) => r.getLong(0) -> (i + 1L) }.toMap

    rows.foreach { case Row(id: Long, rrf: Double, rd: Long, rs: Long) =>
      assert(rd == denseRef.getOrElse(id, -1L), s"doc $id dense rank")
      assert(rs == sparseRef.getOrElse(id, -1L), s"doc $id sparse rank")
      assert(rd != -1L || rs != -1L, s"doc $id in neither candidate list")
      // Exact fusion arithmetic: written-order IEEE sum, roundFixed(9).
      def c(r: Long) = if (r == -1L) 0.0 else 1.0 / (60.0 + r)
      val expected = math.floor((c(rd) + c(rs)) * 1e9 + 0.5) / 1e9
      assert(rrf == expected, s"doc $id rrf $rrf != $expected (rd=$rd rs=$rs)")
    }
    // Served order is (rrf desc, id asc) — a total order.
    val served = rows.map(r => (r.getDouble(1), r.getLong(0)))
    assert(served.sameElements(served.sortBy { case (s, id) => (-s, id) }))
  }

  test("a doc in both candidate lists outranks same-rank single-system docs") {
    // Synthetic corpus engineered so doc 1 ranks first in BOTH systems
    // and docs 2/3 rank first in exactly one: RRF must serve doc 1 first.
    import spark.implicits._
    val docs = Seq(
      (1L, "vector stream window vector"), // strong keyword match
      (2L, "vector stream window"), // second-best keyword match
      (3L, "nothing relevant here"), // dense-only
      (4L, "also nothing here at all")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0, 0.0)), // the query vector
      (1L, Array(0.99, 0.01)), // nearest
      (2L, Array(-1.0, 0.0)), // pushed to the dense tail
      (3L, Array(0.98, 0.02)), // second-nearest
      (4L, Array(-0.9, -0.1))).toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrf(
      docs, "doc_id", "text", embs, "vec_id", "embedding",
      embs.filter(col("vec_id") === 0).select(col("embedding").as("qvec")),
      terms, nDense = 2, nSparse = 2, rrfK = 60, topK = 4,
      excludeVecIds = Seq(0L)).collect()
    val order = out.map(_.getLong(0)).toSeq
    assert(order.head == 1L, s"doc 1 (rank 1 in both systems) must serve first: $order")
    // nDense=2 truncation: doc 2's dense rank is -1 (outside the list),
    // doc 3's sparse rank is -1 (no keyword match).
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(byId(2L) == ((-1L, 2L)), s"doc 2 ranks: ${byId(2L)}")
    assert(byId(3L) == ((2L, -1L)), s"doc 3 ranks: ${byId(3L)}")
    assert(!byId.contains(4L), "doc 4 is in neither list and must not be served")
  }

  test("plan: both candidate lists are distributed top-N; no corpus-wide window") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    val qe = gate().queryExecution
    // Structural per-window check (not a substring scan — a substring
    // scan passes as long as SOME TakeOrdered appears after the FIRST
    // Window, even if one window regressed to corpus-wide): EVERY
    // Window node's input subtree must contain a Limit, i.e. each
    // ranking window runs over a candidate list bounded by construction.
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.size == 2, s"expected dense+sparse ranking windows, got ${windows.size}:\n${qe.optimizedPlan}")
    windows.foreach { w =>
      assert(w.child.collectFirst { case g: GlobalLimit => g }.isDefined,
        s"Window input is NOT bounded by a Limit — corpus-wide window:\n$w")
    }
    // and physically the two bounded sorts are TakeOrderedAndProject
    // (per-partition heaps), never a global sort materialization
    val p = qe.executedPlan.toString
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 2, p)
  }
}
