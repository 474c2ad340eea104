package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

class CurationSpec extends SparkSpecBase {

  test("curate: every stage only removes rows, and the output is clean") {
    val docs = Tables.documents(spark, sfDir)
    val out = Curation.curate(docs, "doc_id", "text").cache()
    val n = out.count()
    assert(n > 0 && n < docs.count())
    // no duplicate ids, every row has a split and a kept language
    assert(out.select("doc_id").distinct().count() === n)
    assert(out.filter(!col("split").isin("train", "val", "test")).count() === 0)
    assert(out.filter(col("predicted_lang") =!= "en").count() === 0)
    assert(out.filter(col("quality_score") < 0.8).count() === 0)
    // exact dedup happened: no two surviving docs share a fingerprint
    val joined = out.join(docs, "doc_id")
      .select(md5(lower(trim(col("text")))).as("fp"))
    assert(joined.distinct().count() === n)
    out.unpersist()
  }

  test("near-dup representatives: no surviving pair is >= 0.5 Jaccard similar") {
    val docs = Tables.documents(spark, sfDir)
    val out = Curation.curate(docs, "doc_id", "text")
    val surviving = out.join(docs, "doc_id").select("doc_id", "text")
    val residualPairs = Dedup.ngramJaccardPairs(surviving, "doc_id", "text").count()
    assert(residualPairs === 0, s"$residualPairs near-dup pairs survived curation")
  }
}
