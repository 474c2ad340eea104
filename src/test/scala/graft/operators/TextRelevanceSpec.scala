package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** TF-IDF and BM25 semantics on hand-checkable fixtures. */
class TextRelevanceSpec extends SparkSpecBase {

  import spark.implicits._

  private def docs = Seq(
    (1L, "cat dog cat"),
    (2L, "dog fish"),
    (3L, "fish fish fish bird"))
    .toDF("doc_id", "text")

  test("canonicalize: lower + punct-to-space + collapse + trim, fingerprints merge variants") {
    val variants = Seq(
      (1L, "Hello,  World!! 42"),
      (2L, "hello world 42"),
      (3L, "  HELLO--WORLD 42  "),
      (4L, "different text")).toDF("doc_id", "text")
    val out = TextAnalysis.canonicalize(variants, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 === "hello world 42")
    assert(out(2L)._1 === "hello world 42")
    assert(out(3L)._1 === "hello world 42")
    assert(out(1L)._2 === out(2L)._2 && out(2L)._2 === out(3L)._2,
      "all three variants must share one dedup fingerprint")
    assert(out(4L)._2 !== out(1L)._2)
    assert(out(1L)._3 && !out(2L)._3 && out(3L)._3)
  }

  test("tfidfTopTerms: tf/df exact, rare terms outrank common ones") {
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", topM = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val byDoc = out.groupBy(_._1)
    // doc 1: cat tf=2 df=1 score=2·ln(3); dog tf=1 df=2 score=ln(1.5)
    val d1 = byDoc(1L).map(t => t._2 -> (t._3, t._4, t._5)).toMap
    assert(d1("cat") === ((2L, 1L,
      math.floor(2 * math.log(3.0) * 1e6 + 0.5) / 1e6)))
    assert(d1("dog")._1 === 1L && d1("dog")._2 === 2L)
    // doc 3: bird (df=1) must be present despite tf=1; fish tf=3
    val d3 = byDoc(3L).map(_._2).toSet
    assert(d3 === Set("fish", "bird"))
    // top-m respected
    assert(byDoc.values.forall(_.length <= 2))
  }

  test("bm25: matched docs only, more distinct matches score higher on equal length") {
    val corpus = Seq(
      (1L, "vector stream window pad"),
      (2L, "vector alpha beta pad"),
      (3L, "alpha beta gamma pad"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(corpus, "doc_id", "text",
      Seq("vector", "stream", "window"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(!out.contains(3L), "no query term → excluded")
    assert(out(1L)._2 === 3L && out(2L)._2 === 1L)
    assert(out(1L)._1 > out(2L)._1, s"3-term doc must outrank 1-term doc: $out")
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    val corpus = Seq(
      (1L, "vector one two"),
      (2L, "vector one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("vector"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L), out)
  }

  test("shuffleShard: permutation — every key once, dense positions per shard, stable") {
    // payload columns must ride along (shuffling the corpus, not just ids)
    val withPayload = Sampling.shuffleShard(
      Seq((1L, "textA"), (2L, "textB")).toDF("id", "text"), "id", 2)
    assert(withPayload.columns.toSet === Set("id", "text", "shard", "pos"))
    val df = (1L to 1000L).toDF("id")
    val out = Sampling.shuffleShard(df, "id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 1000)
    assert(out.map(_._1).distinct.length === 1000)
    assert(out.map(_._2).toSet.subsetOf((0L until 8L).toSet))
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    val again = Sampling.shuffleShard(df.repartition(17), "id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq,
      "shuffle order must be partitioning-invariant")
  }

  test("mixtureEpochs: rate 0 drops, rate >1 repeats, expectation ≈ rate") {
    val df = (1L to 3000L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt)))
      .toDF("id", "cls")
    val out = Sampling.mixtureEpochs(df, "id", "cls",
      Seq("a" -> 2.5, "b" -> 0.25, "c" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(!out.exists(_._2 == "c"))
    val aCopies = out.filter(_._2 == "a").groupBy(_._1).view.mapValues(_.length)
    assert(aCopies.values.forall(n => n == 2 || n == 3))
    val aMean = aCopies.values.sum.toDouble / aCopies.size
    assert(math.abs(aMean - 2.5) < 0.1, s"mean copies $aMean")
    val bFrac = out.count(_._2 == "b").toDouble / 1000
    assert(math.abs(bFrac - 0.25) < 0.07, s"b fraction $bFrac")
    // copy indices dense from 0
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (0L until rows.length).toSeq)
    }
  }

  test("bigram perplexity: golden values on a hand-checkable corpus, garbled text scores worse") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 'a b' repeated is maximally predictable; the shuffled-vocabulary
    // doc uses the same tokens in unseen orders — the LM must find it
    // more surprising (higher perplexity)
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b a b"),
      (3L, "b b a a b a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    assert(out.forall(_._2 === 7L), "8 tokens -> 7 bigrams")
    assert(out(0)._3 === out(1)._3, "identical docs score identically")
    assert(out(2)._3 > out(0)._3,
      s"garbled doc must be more surprising: ${out(2)._3} vs ${out(0)._3}")
    // perplexity of a smoothed model over a tiny vocab is bounded by
    // the vocab-size ceiling (uniform model): V + 1 here with add-1
    assert(out.forall(r => r._3 >= 1.0 && r._3 <= 3.0))
    // a doc below the bigram floor is absent, not a zero row
    val tiny = TextAnalysis.bigramPerplexity(
      Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text").count()
    assert(tiny === 0L)
  }

  test("LM model tables persist to parquet and score new text identically after reload") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = graft.sources.Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
    val (uni, bi) = TextAnalysis.bigramLmModel(corpus, "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    uni.write.parquet(s"$dir/uni")
    bi.write.parquet(s"$dir/bi")
    val fresh = TextAnalysis.bigramPerplexityFromModel(
      delta, "doc_id", "text", uni, bi).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val reloaded = TextAnalysis.bigramPerplexityFromModel(
      delta, "doc_id", "text",
      spark.read.parquet(s"$dir/uni"), spark.read.parquet(s"$dir/bi"))
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(reloaded === fresh)
    assert(fresh.nonEmpty)
    // out-of-model evidence floors at the uniform probability, never NaN
    val alien = TextAnalysis.bigramPerplexityFromModel(
      Seq((1L, "zzz qqq zzz")).toDF("doc_id", "text"), "doc_id", "text",
      uni, bi).as[(Long, Long, Double)].collect().head
    assert(alien._2 === 2L && !alien._3.isNaN && alien._3 > 1.0)
  }
}
