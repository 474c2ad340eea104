package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.VectorFunctions.roundFixed

/** Model-based document quality classifier — the third leg of the
  * standard LLM-curation quality stack (heuristic signals:
  * [[TextAnalysis.qualityScore]]; language-model surprise:
  * [[TextAnalysis.bigramPerplexity]]; and THIS: a trained linear
  * classifier scoring documents against a labeled seed set — the
  * industry-default filter for web-scale corpora).
  *
  * Design, all public technique: logistic regression over hashed
  * bag-of-words features plus three engineered integer features,
  * trained by full-batch gradient descent. Per iteration the plan is
  * exactly two aggregations over the (doc, feature, count) table —
  * a per-doc fixed-point dot product (weights are PLAN LITERALS via
  * `element_at` over an array literal, never a joined table) and a
  * per-feature gradient sum — with one bounded driver collect of
  * `numFeatures + 3` longs per round, the `Clustering.kmeansAssign`
  * round structure. Nothing is quadratic; at 100 TB each round is two
  * map-side-combinable shuffles of (id, long) rows.
  *
  * Cross-engine determinism (the ta_perplexity trick,
  * [[TextAnalysis.bigramPerplexityFromModel]]): every accumulated
  * quantity is an INTEGER — feature counts, fixed-point weights,
  * fixed-point per-doc residuals, gradient sums — so aggregation order
  * cannot change a bit. Doubles appear only in per-row scalar chains
  * (sigmoid, the weight-update step) that both engines evaluate with
  * the same correctly-rounded primitives, immediately re-fixed to
  * 6 decimals as longs. The DuckDB oracle unrolls the SAME `iters`
  * rounds as chained MATERIALIZED CTEs and must reproduce the final
  * probabilities exactly.
  *
  * Seed labels are derived IN-PLAN from the heuristic quality score's
  * extremes (score ≥ `highQ` → positive, ≤ `lowQ` → negative, middle
  * excluded) — deterministic, label-file-free, and exactly the
  * bootstrap a production pipeline uses before hand-labeled data
  * exists. The learned model is `numFeatures + 3` fixed-point longs —
  * trivially persistable, and scoring under a frozen weight vector is
  * one aggregation ([[scoreWithWeights]]).
  */
object QualityClassifier {

  /** Hashed feature buckets; the full feature space is this + 3
    * engineered features (distinct-token count, a length-score proxy,
    * and a constant-after-normalization bias). */
  val DefaultNumFeatures = 32
  val DefaultIters = 12
  val DefaultLearningRate = 300.0
  /** Seed-label thresholds on the heuristic quality score: ≤ lowQ →
    * negative, ≥ highQ → positive (≈ the fixture's quartiles, giving a
    * balanced seed set). */
  val DefaultLowQ = 0.90
  val DefaultHighQ = 1.07
  /** 6-decimal fixed point, shared with the perplexity operator. */
  private val Scale = 1000000.0

  /** The (doc, f, c, n) integer feature table — one scan, one hash
    * aggregate (hashed unigram counts), and a zero-shuffle engineered
    * union:
    *   - f ∈ [0, nf): md5-hashed token count (DuckDB-recomputable hash,
    *     the `TextFunctions.baseHash` convention);
    *   - f = nf: distinct-token count (→ distinct ratio after the /n
    *     normalization in the dot product);
    *   - f = nf+1: ⌊least(n²/100, n)⌋ (→ ≈ the length score after /n);
    *   - f = nf+2: n itself (→ the constant 1 after /n — the bias).
    * The engineered rows are what make the heuristic-derived seed
    * labels LEARNABLE by a linear model: distinct ratio and length are
    * not linear in normalized token counts alone. */
  private[operators] def featureTable(
      docs: DataFrame, idCol: String, textCol: String, nf: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val hashed = toks
      .select(col("doc"), size(col("t")).cast("long").as("n"),
        explode(col("t")).as("w"))
      .groupBy(col("doc"), col("n"),
        pmod(TextFunctions.shingleKey(col("w")), lit(nf.toLong)).as("f"))
      .agg(count(lit(1)).as("c"))
    val n = size(col("t")).cast("long")
    val eng = toks.select(col("doc"), n.as("n"),
      explode(array(
        struct(lit(nf.toLong).as("f"),
          size(array_distinct(col("t"))).cast("long").as("c")),
        struct(lit(nf.toLong + 1).as("f"),
          floor(least(n * n / lit(100.0), n.cast("double"))).cast("long").as("c")),
        struct(lit(nf.toLong + 2).as("f"), n.as("c")))).as("fc"))
      .select(col("doc"), col("n"), col("fc.f").as("f"), col("fc.c").as("c"))
    hashed.unionByName(eng)
  }

  /** Per-row fixed-point dot → sigmoid chain over a (dot, n) row. */
  private def sigmoidOfDot: Column =
    lit(1.0) / (lit(1.0) +
      exp(-(col("dot").cast("double") / (lit(Scale) * col("n").cast("double")))))

  /** The in-plan seed labels: (doc, y) from the heuristic quality
    * score's extremes. `scoreCol` lets callers that ALREADY carry the
    * quality score (Curation survivors — stage 1 computed it with the
    * identical expression) skip the re-tokenize/re-score pass. */
  private def seedLabels(
      docs: DataFrame, idCol: String, textCol: String,
      lowQ: Double, highQ: Double,
      scoreCol: Option[String] = None): DataFrame = {
    val scored = scoreCol match {
      case Some(c) => docs.select(col(idCol), col(c).as("quality_score"))
      case None => TextAnalysis.qualityScore(docs, idCol, textCol)
    }
    scored
      .select(col(idCol).as("doc"),
        when(col("quality_score") >= highQ, lit(1L))
          .when(col("quality_score") <= lowQ, lit(0L)).as("y"))
      .filter(col("y").isNotNull)
  }

  /** Train the fixed-point weight vector (length `nf + 3`). Driver
    * state per round: the collected gradient (nf + 3 longs) — bounded
    * model state, the kmeans-centroid convention. */
  def trainWeights(
      docs: DataFrame, idCol: String, textCol: String,
      nf: Int = DefaultNumFeatures, iters: Int = DefaultIters,
      lr: Double = DefaultLearningRate,
      lowQ: Double = DefaultLowQ, highQ: Double = DefaultHighQ,
      seedScoreCol: Option[String] = None): Array[Long] = {
    require(nf >= 1 && iters >= 1)
    // ONE materialized row per labeled doc carrying its whole (bounded,
    // ≤ n+3 entries) feature vector: the per-round residual is then an
    // IN-ROW fixed-point dot (no per-doc groupBy, no join back), and
    // the gradient is the round's ONLY aggregation — explode(fs) →
    // groupBy(f). Halves the per-round job latency vs the two-shuffle
    // formulation while summing the exact same multiset of longs
    // (integer addition is order-independent, so collect_list's
    // nondeterministic order cannot change a bit — hash-equal to the
    // oracle's join-based formulation).
    val labeled = featureTable(docs, idCol, textCol, nf)
      .groupBy("doc", "n")
      .agg(collect_list(struct(col("f"), col("c"))).as("fs"))
      .join(seedLabels(docs, idCol, textCol, lowQ, highQ, seedScoreCol), "doc")
      .select(col("n"), col("y"), col("fs"))
      .localCheckpoint(false)
    val counts = labeled.agg(
      count(lit(1)).as("n"), sum("y").as("pos")).head
    val nTrain = counts.getLong(0)
    val nPos = Option(counts.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    // BOTH classes must exist: an all-negative seed set trains a
    // drop-everything model (every residual positive, weights pushed
    // uniformly negative) and an all-positive one a keep-everything
    // no-op — either silently, which for a curation caller means an
    // emptied or unfiltered corpus with no error. Fail loudly; the
    // thresholds are the knobs to adjust.
    require(nTrain > 0 && nPos > 0 && nPos < nTrain,
      s"seed labels must contain both classes (got $nPos positive of " +
        s"$nTrain labeled docs) — adjust lowQ/highQ to the corpus's " +
        "quality distribution")
    // Size-adaptive round parallelism: the loop below launches `iters`
    // SEQUENTIAL jobs over the checkpointed table, so at small corpora
    // the wall-clock is pure task-scheduling overhead (k rounds ×
    // partitions × 2 stages), not work. nTrain is in hand — narrow-
    // coalesce the rounds' input to ~8k labeled docs per task (never
    // above the checkpoint's own partitioning, so a 100 TB corpus keeps
    // full parallelism). Integer gradient sums are order-independent,
    // so layout cannot change a bit of the learned weights.
    val perRound = {
      val have = labeled.rdd.getNumPartitions
      val want = math.max(1L, math.min(have.toLong, (nTrain + 7999) / 8000)).toInt
      if (want < have) labeled.coalesce(want) else labeled
    }
    var w = Array.fill(nf + 3)(0L)
    for (_ <- 1 to iters) {
      val wLit = typedLit(w.toSeq)
      val dot = aggregate(col("fs"), lit(0L), (acc, s) =>
        acc + element_at(wLit, (s.getField("f") + 1L).cast("int")) *
          s.getField("c"))
      // per-doc fixed-point residual: r = ⌊(σ(w·x) − y)/n · S + ½⌋
      val resid = floor((sigmoidOfDot - col("y").cast("double")) /
        col("n").cast("double") * lit(Scale) + lit(0.5)).cast("long")
      // per-feature gradient: g_f = Σ_docs r · c — integer, exact
      val grads = perRound
        .select(col("n"), col("y"), col("fs"), dot.as("dot"))
        .select(resid.as("resid"), explode(col("fs")).as("s"))
        .groupBy(col("s.f")).agg(sum(col("resid") * col("s.c")).as("g"))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      // the same scalar update chain the oracle runs: lr·g/N, floored
      // at 0.5 — all inputs exact in double range
      w = Array.tabulate(nf + 3)(f =>
        w(f) - math.floor(
          lr * grads.getOrElse(f, 0L).toDouble / nTrain + 0.5).toLong)
    }
    w
  }

  /** Score every document under a (possibly frozen/persisted) weight
    * vector: one aggregation. Output (doc, n_tokens, clf_prob,
    * clf_label) — the label compares the ROUNDED probability in both
    * engines, so the 0.5 boundary cannot straddle an ulp. */
  def scoreWithWeights(
      docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Long]): DataFrame = {
    val nf = weights.length - 3
    require(nf >= 1, "weights must cover the 3 engineered features")
    val wLit = typedLit(weights.toSeq)
    featureTable(docs, idCol, textCol, nf)
      .groupBy("doc", "n")
      .agg(sum(element_at(wLit, (col("f") + 1).cast("int")) * col("c")).as("dot"))
      .select(
        col("doc").as(idCol), col("n").as("n_tokens"),
        roundFixed(sigmoidOfDot, 6).as("clf_prob"))
      .withColumn("clf_label", (col("clf_prob") >= 0.5).cast("int"))
  }

  /** IN-ROW scoring twin of [[scoreWithWeights]]: the fixed-point dot
    * product Σ_f w_f·c_f equals Σ_tokens w[hash(token)] plus the three
    * engineered terms, so scoring is a pure per-row expression — no
    * feature table, no aggregation, no shuffle. Both formulations sum
    * the SAME multiset of longs (integer addition is order-independent),
    * so the result is BIT-IDENTICAL to the aggregated path
    * (QualityClassifierSpec proves row-for-row equality) — which makes
    * this the streaming twin's body: a stateless projection is legal on
    * any streaming frame with no watermark or state at all
    * (streaming.StreamingQualityClassifier). */
  def scoreRowWise(
      docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Long]): DataFrame = {
    val nf = weights.length - 3
    require(nf >= 1, "weights must cover the 3 engineered features")
    // reserved output/scratch names — a clash (e.g. re-scoring an
    // already-scored frame) would surface later as an opaque
    // AMBIGUOUS_REFERENCE; fail fast (the qualityLangFilter convention)
    val reserved = Seq("n_tokens", "dot", "clf_prob", "clf_label", "__t")
    val clash = docs.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"scoreRowWise input must not carry reserved column(s) ${clash.mkString(", ")}")
    val wLit = typedLit(weights.toSeq)
    val t = col("__t")
    val n = size(t).cast("long")
    val hashedDot = aggregate(
      transform(t, w => element_at(wLit,
        (pmod(TextFunctions.shingleKey(w), lit(nf.toLong)) + 1L).cast("int"))),
      lit(0L), (acc, x) => acc + x)
    val dot = hashedDot +
      element_at(wLit, nf + 1) * size(array_distinct(t)).cast("long") +
      element_at(wLit, nf + 2) *
        floor(least(n * n / lit(100.0), n.cast("double"))).cast("long") +
      element_at(wLit, nf + 3) * n
    docs
      .select(docs.columns.map(col).toSeq :+
        TextFunctions.tokens(col(textCol)).as("__t"): _*)
      .select(docs.columns.map(col).toSeq ++ Seq(
        n.as("n_tokens"), dot.as("dot")): _*)
      .select(docs.columns.map(col).toSeq ++ Seq(
        col("n_tokens"),
        roundFixed(lit(1.0) / (lit(1.0) +
          exp(-(col("dot").cast("double") /
            (lit(Scale) * col("n_tokens").cast("double"))))), 6).as("clf_prob")): _*)
      .withColumn("clf_label", (col("clf_prob") >= 0.5).cast("int"))
  }

  /** Train-then-score in one call — the gated composition
    * (ta_quality_clf). Scoring goes through the IN-ROW twin
    * ([[scoreRowWise]] — bit-identical to the aggregated path,
    * QualityClassifierSpec) so the corpus-wide scoring pass is a pure
    * shuffle-free projection; [[scoreWithWeights]] remains the shape
    * for callers that already carry a feature table. */
  def classify(
      docs: DataFrame, idCol: String, textCol: String,
      nf: Int = DefaultNumFeatures, iters: Int = DefaultIters,
      lr: Double = DefaultLearningRate,
      lowQ: Double = DefaultLowQ, highQ: Double = DefaultHighQ): DataFrame = {
    val w = trainWeights(docs, idCol, textCol, nf, iters, lr, lowQ, highQ)
    scoreRowWise(docs.select(col(idCol), col(textCol)), idCol, textCol, w)
      .select(col(idCol), col("n_tokens"), col("clf_prob"), col("clf_label"))
  }

  // ------------------------------------------------------------------
  // Driver-side reference (differential testing only, the
  // bpeTrainReference pattern): the same algorithm over collected rows
  // in plain Scala collections — no Spark, no SQL — so the distributed
  // implementation is checked against an independent simple one.
  // ------------------------------------------------------------------

  private[operators] def hashToken(w: String, nf: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % nf).toInt
  }

  private[operators] def referenceClassify(
      rows: Seq[(Long, String)], nf: Int, iters: Int, lr: Double,
      lowQ: Double, highQ: Double): Seq[(Long, Long, Double, Int)] = {
    val scale = Scale
    val stop = Set("the", "a")
    def feats(text: String): (Long, Map[Int, Long]) = {
      val t = text.split(" ", -1)
      val n = t.length.toLong
      val hashed = t.groupBy(w => hashToken(w, nf)).map { case (f, ws) =>
        f -> ws.length.toLong }
      val eng = Map(
        nf -> t.distinct.length.toLong,
        (nf + 1) -> math.floor(math.min(n.toDouble * n / 100.0, n.toDouble)).toLong,
        (nf + 2) -> n)
      (n, hashed ++ eng)
    }
    def quality(text: String): Double = {
      val t = text.split(" ", -1)
      val n = t.length
      t.distinct.length.toDouble / n + math.min(n / 100.0, 1.0) -
        t.count(stop).toDouble / n
    }
    val docFeats = rows.map { case (id, text) => (id, feats(text)) }
    val labels = rows.flatMap { case (id, text) =>
      val q = quality(text)
      if (q >= highQ) Some(id -> 1L)
      else if (q <= lowQ) Some(id -> 0L) else None
    }.toMap
    var w = Array.fill(nf + 3)(0L)
    for (_ <- 1 to iters) {
      val g = Array.fill(nf + 3)(0L)
      docFeats.foreach { case (id, (n, fs)) =>
        labels.get(id).foreach { y =>
          val dot = fs.map { case (f, c) => w(f) * c }.sum
          val p = 1.0 / (1.0 + math.exp(-(dot.toDouble / (scale * n))))
          val resid = math.floor((p - y) / n * scale + 0.5).toLong
          fs.foreach { case (f, c) => g(f) += resid * c }
        }
      }
      w = Array.tabulate(nf + 3)(f =>
        w(f) - math.floor(lr * g(f).toDouble / labels.size + 0.5).toLong)
    }
    docFeats.map { case (id, (n, fs)) =>
      val dot = fs.map { case (f, c) => w(f) * c }.sum
      val p = 1.0 / (1.0 + math.exp(-(dot.toDouble / (scale * n))))
      val prob = math.floor(p * scale + 0.5) / scale
      (id, n, prob, if (prob >= 0.5) 1 else 0)
    }.sortBy(_._1)
  }
}
