package graft.operators

import graft.SparkSpecBase

class PackingSpec extends SparkSpecBase {

  import spark.implicits._

  test("chunkDocuments: full coverage, exact overlap, lossless reconstruction") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens → 7 chunks
      (2L, (1 to 32).map(i => s"s$i").mkString(" ")), // exactly one window
      (3L, "tiny doc")) // shorter than the window
      .toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 32, overlap = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))

    val byDoc = out.groupBy(_._1)
    // 100 tokens, stride 24: chunks start at 0,24,48,72 → last covers 72..99
    assert(byDoc(1L).length === 4)
    assert(byDoc(2L).length === 1 && byDoc(2L).head._3 === 32)
    assert(byDoc(3L).length === 1 && byDoc(3L).head._3 === 2)
    // consecutive chunks share exactly `overlap` tokens
    val c1 = byDoc(1L).map(_._4.split(" ").toSeq).toList
    c1.sliding(2).foreach {
      case List(a, b) => assert(a.takeRight(8) === b.take(8), "overlap mismatch")
      case _ =>
    }
    // dropping each successor's overlap reconstructs the original
    val rebuilt = c1.head ++ c1.tail.flatMap(_.drop(8))
    assert(rebuilt === (1 to 100).map(i => s"t$i"))
  }
}
