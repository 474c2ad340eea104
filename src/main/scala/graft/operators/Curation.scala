package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end corpus curation — the pipeline a training corpus actually
  * ships through, composed from this library's already-gated operators:
  *
  *   1. quality floor        (TextAnalysis.qualityScore)
  *   2. language filter      (TextAnalysis.languageId)
  *   3. exact dedup          (content fingerprint, keep min id)
  *   4. near-dup dedup       (inverted-index Jaccard pairs →
  *                            connected-component clusters, keep the
  *                            cluster representative)
  *   5. split assignment     (Sampling.splitByKey — key-stable)
  *
  * Scale shape: stages 1-2 FUSE into a single projection over one scan
  * (the metric expressions are column-level — no metric frames joined
  * back on the id); stage 3 is one hash aggregate on the fingerprint;
  * stage 4 is the guarded posting-list join + O(diameter) label
  * propagation over the (tiny) duplicate-pair graph; stage 5 is a
  * stateless projection. Nothing is quadratic in documents, and the
  * corpus is scanned once before dedup.
  */
object Curation {

  case class Config(
      minQuality: Double = 0.8,
      languages: Seq[String] = Seq("en"),
      nGram: Int = Dedup.DefaultShingleN,
      jaccardThreshold: Double = Dedup.DefaultMinhashThreshold,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      // substring-dedup stage (4b): trim shared spans among the
      // surviving documents (Dedup.trimSharedSpans — each span's min-id
      // doc keeps its copy, the other side's occurrence is cut). Runs
      // AFTER document-level dedup — whole-document duplicates are
      // dropped, never trimmed to shells — and BEFORE the id-keyed
      // split (unaffected by text surgery). When on, the output gains
      // the rebuilt text and its removed-token count.
      trimSpans: Boolean = false,
      spanK: Int = Dedup.DefaultSpanK,
      minSpanTokens: Int = Dedup.DefaultMinSpanTokens)

  /** Stages 1–2 fused into one stateless projection + filter over one
    * scan: every input column survives, plus `quality_score` and
    * `predicted_lang`. Shared verbatim by the batch pipeline below and
    * the streaming twin (streaming.StreamingCuration) so the two
    * postures cannot drift. Token arrays are materialized in their own
    * projections first (interpreted HOFs re-evaluate inlined
    * expressions per lambda reference). */
  def qualityLangFilter(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    // reserved output/scratch names: a clash would surface later as an
    // opaque AMBIGUOUS_REFERENCE at analysis time (e.g. re-curating a
    // frame that already carries quality_score) — fail fast instead
    val reserved = Seq("quality_score", "predicted_lang", "__t", "__td")
    val clash = docs.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"qualityLangFilter input must not carry reserved column(s) ${clash.mkString(", ")}")
    val passthrough = docs.columns.map(col).toSeq
    docs
      .select(passthrough :+ TextFunctions.tokens(col(textCol)).as("__t"): _*)
      .select(passthrough ++ Seq(col("__t"), array_distinct(col("__t")).as("__td")): _*)
      .select(passthrough ++ Seq(
        TextAnalysis.qualityScoreCol(col("__t")).as("quality_score"),
        TextAnalysis.predictedLangCol(col("__td")).as("predicted_lang")): _*)
      .filter(col("quality_score") >= cfg.minQuality &&
        col("predicted_lang").isInCollection(cfg.languages))
  }

  /** Returns the curated corpus: (id, predicted_lang, quality_score,
    * split) — one row per surviving document; with `cfg.trimSpans` on,
    * also (textCol, removed_tokens) carrying the span-trimmed text. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val base = qualityLangFilter(
      docs.select(col(idCol), col(textCol)), idCol, textCol, cfg)
    // exact dedup: one row per content fingerprint (canonical = min id)
    val canon = base
      .select(col(idCol).as("__id"), md5(lower(trim(col(textCol)))).as("__fp"))
      .groupBy("__fp").agg(min("__id").as(idCol))
      .select(idCol)
    val exact = base.join(canon, Seq(idCol), "left_semi")
    // near-dup clusters among survivors; drop non-representatives
    val pairs = Dedup.ngramJaccardPairs(
      exact, idCol, textCol, cfg.nGram, cfg.jaccardThreshold)
    val dropped = Dedup.duplicateClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    val unique0 = exact.join(dropped, Seq(idCol), "left_anti")
    // with the span stage on, `unique` fans out into three consumers
    // (split assignment, the trim's posting self-join, and the trim's
    // text rebuild); Spark reuses exchanges, not projection subtrees,
    // so the whole quality→dedup pipeline above would re-run per
    // consumer — materialize the survivor set once. LAZY checkpoint
    // (the bm25 convention): constructing the curated frame stays
    // plan-only; the pipeline runs at the FIRST action and the
    // materialized survivors are shared by all three consumers
    val unique = if (cfg.trimSpans) unique0.localCheckpoint(false) else unique0
    val out = Sampling.splitByKey(unique, idCol, cfg.splits)
      .select(col(idCol), col("predicted_lang"), col("quality_score"), col("split"))
    withSpanTrim(out, unique, idCol, textCol, cfg)
  }

  /** Stage 4b — substring dedup over the surviving corpus: shared spans
    * ≥ `cfg.minSpanTokens` are cut from the max-id side
    * (Dedup.trimSharedSpans), and the curated rows gain the rebuilt
    * text + removed-token count. No-op (and no extra columns) when
    * `cfg.trimSpans` is off. Shared by the batch pipeline and the
    * streaming twin's finalization so the two postures cannot drift. */
  private[graft] def withSpanTrim(out: DataFrame, survivors: DataFrame,
      idCol: String, textCol: String, cfg: Config): DataFrame =
    if (!cfg.trimSpans) out
    else out
      .join(
        Dedup.trimSharedSpans(survivors, idCol, textCol,
            cfg.spanK, cfg.minSpanTokens)
          .select(col("doc_id").as(idCol), col("trimmed").as(textCol),
            col("removed_tokens")),
        Seq(idCol))
      .select(col(idCol), col("predicted_lang"), col("quality_score"),
        col("split"), col(textCol), col("removed_tokens"))
}
