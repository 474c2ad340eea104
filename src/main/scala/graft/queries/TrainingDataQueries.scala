package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, SimilaritySearch, TextAnalysis}
import graft.sources.Tables

/** Training-data pipeline operators as driver-gated queries over the
  * `documents` and `embeddings` testdata tables. SQL-expressible ops
  * carry a DuckDB oracle; signature-based ops (MinHash/SimHash/LSH —
  * xxhash64 has no DuckDB twin) are declared without an oracle and get
  * the driver's rows-only check, with their correctness asserted in
  * ScalaTest specs instead.
  */
object TrainingDataQueries {

  type Q = (SparkSession, String) => DataFrame

  /** dd_exact — exact dedup groups by content fingerprint. */
  val ddExact: Q = (s, dir) =>
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("fingerprint")

  val ddExactOracle: String =
    """SELECT md5(text) AS fingerprint,
      |  COUNT(*) AS n_docs,
      |  MIN(doc_id) AS canonical_id
      |FROM documents
      |GROUP BY 1
      |ORDER BY fingerprint""".stripMargin

  /** dd_ngram_jaccard — exact 3-gram Jaccard near-dup pairs via the
    * inverted-index plan; oracle recomputes all-pairs naively. */
  val ddNgramJaccard: Q = (s, dir) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("doc_a", "doc_b")

  val ddNgramJaccardOracle: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(len(string_split(text,' ')) - 2),
      |    i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3]
      |  )) AS s
      |  FROM documents)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** dd_minhash — MinHash(64)+LSH(16 bands) near-dup pairs (rows-only:
    * xxhash64 signatures have no DuckDB equivalent; spec-tested against
    * dd_ngram_jaccard ground truth). */
  val ddMinhash: Q = (s, dir) =>
    Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  /** dd_minhash_verified — LSH candidates re-ranked by exact Jaccard
    * (rows-only: output equals dd_ngram_jaccard whenever LSH recall is
    * total, which the spec asserts on the fixture corpus — but LSH is
    * probabilistic, so it is not oracle-gated). */
  val ddMinhashVerified: Q = (s, dir) =>
    Dedup.minhashPairsVerified(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  /** dd_simhash — 64-bit SimHash banded near-dup pairs (rows-only). */
  val ddSimhash: Q = (s, dir) =>
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  /** ta_token_stats — per-document token statistics. */
  val taTokenStats: Q = (s, dir) =>
    TextAnalysis.tokenStats(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  val taTokenStatsOracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct_tokens,
      |  CAST(length(replace(text,' ','')) AS DOUBLE) / len(string_split(text,' ')) AS avg_token_len,
      |  CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE) / len(string_split(text,' ')) AS stopword_ratio,
      |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) AS distinct_ratio
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** ta_quality — composite quality score. */
  val taQuality: Q = (s, dir) =>
    TextAnalysis.qualityScore(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  val taQualityOracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) AS distinct_ratio,
      |  CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE) / len(string_split(text,' ')) AS stopword_ratio,
      |  (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' '))
      |   + LEAST(len(string_split(text,' ')) / 100.0, 1.0)
      |   - CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE) / len(string_split(text,' '))) AS quality_score
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** ta_langid — heuristic stopword-profile language ID (rows-only: the
    * heuristic itself is the operator; spec-tested for determinism). */
  val taLangid: Q = (s, dir) =>
    TextAnalysis.languageId(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** ta_fingerprint — normalized content fingerprint (md5 over
    * lower/trim). */
  val taFingerprint: Q = (s, dir) =>
    TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  val taFingerprintOracle: String =
    """SELECT doc_id, md5(lower(trim(text))) AS fingerprint
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** ss_topk_cosine — exact brute-force top-10 cosine neighbors of
    * vec_id=0 (the ANN correctness baseline). */
  val ssTopkCosine: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    SimilaritySearch.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", query, 10)
  }

  val ssTopkCosineOracle: String =
    """SELECT vec_id,
      |  list_dot_product(CAST(embedding AS DOUBLE[]), q) /
      |  (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
      |   sqrt(list_dot_product(q, q))) AS cos
      |FROM embeddings,
      |  (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0)
      |WHERE vec_id <> 0
      |ORDER BY cos DESC, vec_id ASC
      |LIMIT 10""".stripMargin

  /** ss_ann_lsh — hyperplane-LSH bucketed neighbor search, k=3 per
    * vector (rows-only: the scale path; recall spec-tested against the
    * brute-force baseline). */
  val ssAnnLsh: Q = (s, dir) =>
    SimilaritySearch.lshNeighbors(
      Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64, nBits = 6, k = 3)
      .orderBy("vec_id", "neighbor_id")

  /** mm_features — multimodal binary-column plumbing: synthesize media
    * rows from the documents table, extract per-item features via typed
    * mapPartitions (decode stubbed — see operators.Multimodal). Rows-only
    * check: the stub checksum/entropy have no SQL oracle. */
  val mmFeatures: Q = (s, dir) =>
    Multimodal.extractFeatures(
      Multimodal.syntheticMediaFromText(Tables.documents(s, dir), "doc_id", "text"))
      .toDF().orderBy("media_id")

  /** dd_embedding — embedding-cosine near-duplicate pairs via hyperplane
    * LSH buckets (rows-only; the scale path for vector dedup — exact
    * all-pairs cosine is quadratic). Few bits → high recall at our
    * corpus size; pairs above 0.9 cosine are near-dups. */
  val ddEmbedding: Q = (s, dir) =>
    SimilaritySearch.lshNeighbors(
      Tables.embeddings(s, dir), "vec_id", "embedding", dim = 64, nBits = 4, k = 5)
      .filter(col("cos") >= 0.9)
      .filter(col("vec_id") < col("neighbor_id"))
      .orderBy("vec_id", "neighbor_id")

  /** sk_sketches — approximate aggregates (HLL++ distinct count,
    * approximate percentiles): the constant-memory alternative to exact
    * distinct/percentile at 100 TB (rows-only: sketch results are
    * engine-specific by design; the spec bounds their error against the
    * exact values instead). */
  val skSketches: Q = (s, dir) => {
    import org.apache.spark.sql.functions._
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99_value"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "mm_features" -> mmFeatures,
    "sk_sketches" -> skSketches,
    "dd_embedding" -> ddEmbedding,
    "dd_exact" -> ddExact,
    "dd_ngram_jaccard" -> ddNgramJaccard,
    "dd_minhash" -> ddMinhash,
    "dd_minhash_verified" -> ddMinhashVerified,
    "dd_simhash" -> ddSimhash,
    "ta_token_stats" -> taTokenStats,
    "ta_quality" -> taQuality,
    "ta_langid" -> taLangid,
    "ta_fingerprint" -> taFingerprint,
    "ss_topk_cosine" -> ssTopkCosine,
    "ss_ann_lsh" -> ssAnnLsh)

  val oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactOracle,
    "dd_ngram_jaccard" -> ddNgramJaccardOracle,
    "ta_token_stats" -> taTokenStatsOracle,
    "ta_quality" -> taQualityOracle,
    "ta_fingerprint" -> taFingerprintOracle,
    "ss_topk_cosine" -> ssTopkCosineOracle)
}
