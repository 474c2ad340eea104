package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Locks in the physical-plan properties that matter at 100 TB: filters
  * reaching the parquet scan, pruned read schemas, broadcast joins for
  * dimensions, map-side partial aggregation, and top-k via
  * TakeOrderedAndProject (never a global sort). A regression that turns
  * one of these into a full scan / shuffle join / global sort fails here
  * long before a cluster run would reveal it. */
class PlanQualitySpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan and the scan is column-pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // 11-column lineitem pruned to the referenced columns (string is
    // truncated in plan rendering — prefix is enough to prove pruning)
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_returnflag:string"), p)
  }

  test("q01: aggregation is partial (map-side combine before the shuffle)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("Exchange hashpartitioning(l_returnflag"), p)
  }

  test("q05: dimension tables join via BroadcastHashJoin, never cartesian") {
    val p = plan("q05_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q11: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q11_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q13: the non-equi retention join keys on user_id equality with range residuals") {
    val p = plan("q13_cte_retention")
    // equi hash key present (broadcast or shuffled hash/SMJ), and no
    // nested-loop fallback for the theta conjuncts
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q02: IN-list and null filters are pushed to the events scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters") && p.contains("In(event_type"), p)
  }

  test("ss_ann_lsh: one corpus scan, one hash shuffle, no all-pairs window") {
    val p = plan("ss_ann_lsh")
    // the bucketed projection is computed ONCE (a self-join would scan +
    // project the corpus twice), candidates and the per-vector top-k stay
    // inside the bucket group (a row_number window would shuffle every
    // candidate pair), and the only hash exchange is the bucket groupBy
    val scans = "FileScan".r.findAllIn(p).length
    assert(scans === 1, s"$scans corpus scans:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"$exchanges hash exchanges:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("ss_ann_ivf: one corpus scan, bounded shuffles, no all-pairs window") {
    val p = plan("ss_ann_ivf")
    // centroid training is a separate tiny job; the MAIN plan must scan
    // the corpus once, shuffle only for the cell groupBy and the typed
    // top-k aggregation, and never window over candidate pairs
    val scans = "FileScan".r.findAllIn(p).length
    assert(scans === 1, s"$scans corpus scans:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"$exchanges hash exchanges:\n$p")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21_asof_join: no join operator, a single hash exchange") {
    val p = plan("q21_asof_join")
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"$exchanges hash exchanges:\n$p")
  }

  test("q22_range_join: the pure range predicate rides an equi bucket join, not BNLJ") {
    val p = plan("q22_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ds_split and ta_repetition: stateless scan-speed projections, no hash shuffle") {
    for (name <- Seq("ds_split", "ta_repetition")) {
      val p = plan(name)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges === 0, s"$name: $exchanges hash exchanges:\n$p")
      assert(!p.contains("Window"), s"$name:\n$p")
    }
  }

  test("tp_pack: the only window partitions by shard (no global sort of the corpus)") {
    val p = plan("tp_pack")
    assert(p.contains("Window"), p)
    assert(p.contains("partitionBy=[shard") || p.contains("hashpartitioning(shard"), p)
  }

  test("cl_kmeans: final assignment is a pure projection (centroids are plan literals)") {
    val p = plan("cl_kmeans")
    assert(!p.contains("Join"), s"assignment must not join a centroid table:\n$p")
    assert(!p.contains("Window"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 0, s"$exchanges hash exchanges:\n$p")
  }

  test("ta_tfidf: df broadcasts and the corpus explode+shuffle is computed ONCE") {
    val qe = SparkEntry.queries("ta_tfidf")(spark, sfDir).queryExecution
    qe.toRdd.count() // materialize so AQE's runtime exchange reuse is visible
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), s"df lookup must broadcast, not SMJ:\n$p")
    // the tf and df branches share one (doc,term) exchange — without the
    // pruning-defeating guard in tfidfTopTerms the corpus is exploded and
    // shuffled twice
    assert(p.contains("ReusedExchange"), s"tf exchange must be reused:\n$p")
  }

  test("op_merge_scd2: exactly one join of current-slice vs updates, no cartesian") {
    val p = plan("op_merge_scd2")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // single-pass merge: the dim-vs-updates full-outer join executes ONCE
    // (the update batch itself contains one orders aggregation join-free
    // union, so exactly one join node total)
    val joins = "MergeJoin|HashJoin".r.findAllIn(p).length
    assert(joins === 1, s"$joins join nodes:\n$p")
  }

  test("tp_shuffle and ta_vocab: scan-shaped (shard-local window / TakeOrdered top-V)") {
    val ps = plan("tp_shuffle")
    assert(ps.contains("hashpartitioning(shard") || ps.contains("partitionBy=[shard"),
      s"position window must partition by shard:\n$ps")
    val pv = plan("ta_vocab")
    assert(pv.contains("TakeOrderedAndProject"),
      s"top-V must be TakeOrdered, not a global sort:\n$pv")
    val pw = plan("ds_weighted")
    assert(pw.contains("TakeOrderedAndProject"),
      s"weighted sample must be TakeOrdered, not a global sort:\n$pw")
  }

  test("dd_minhash: the bucket groupBy is the ONLY hash shuffle") {
    val p = plan("dd_minhash")
    // signatures are projections over the scan; multi-band pair dedup is
    // in-row (first-colliding-band filter), so the candidate set is never
    // re-shuffled
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"$exchanges exchanges:\n$p")
  }

  test("q23/q24/q25: sort-based percentiles (no value buffer), partial cube, single-pass pivot") {
    val p23 = plan("q23_percentiles")
    // the percentile AGGREGATE collects a per-group buffer — q23 must
    // stay the window-rank formulation (spillable at any group size)
    assert(!p23.contains("ObjectHashAggregate"), p23)
    assert(p23.contains("Window"), p23)
    val p24 = plan("q24_cube")
    assert(p24.contains("Expand"), p24)
    assert(p24.contains("partial_count") || p24.contains("partial_sum"), p24)
    val p25 = plan("q25_pivot")
    // explicit pivot values ⇒ one scan, no distinct-values pre-query and
    // no join; Spark plans pivot as two partial-aggregated levels
    // ((rf,ls) sum, then pivotfirst on rf) — exactly 2 exchanges
    assert(!p25.contains("Join"), p25)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p25).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p25")
    assert(p25.contains("partial_sum"), p25)
  }

  test("q26: set ops plan as aggregate + semi/anti joins, never nested-loop") {
    val p = plan("q26_set_ops")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // INTERSECT/EXCEPT distinct semantics = aggregate feeding semi/anti
    // hash joins; both branches must appear
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
  }

  test("q27/q28: grouping sets stay one Expand pass; the window suite shares one sort-shuffle") {
    val p27 = plan("q27_grouping_sets")
    // explicit grouping sets plan exactly like rollup/cube: Expand +
    // map-side partial aggregation, one hash exchange, no lattice rescan
    assert(p27.contains("Expand"), p27)
    assert(p27.contains("partial_count") || p27.contains("partial_sum"), p27)
    val ex27 = "Exchange hashpartitioning".r.findAllIn(p27).length
    assert(ex27 === 1, s"$ex27 hash exchanges:\n$p27")
    val p28 = plan("q28_window_suite")
    // all eight window functions share (partitionBy, orderBy) — ONE
    // hash exchange and one sort feed the stacked Window operators; a
    // per-function re-shuffle would be a scale regression
    val ex28 = "Exchange hashpartitioning".r.findAllIn(p28).length
    assert(ex28 === 1, s"$ex28 hash exchanges:\n$p28")
    assert(p28.contains("Window"), p28)
    assert(!p28.contains("Join"), p28)
  }

  test("large-k kmeans: the native assignment path is STILL a pure projection") {
    // the reference-object path must preserve every plan property the
    // literal path is locked to above: no join, no window, no exchange —
    // and the matrix must not leak into the rendered plan
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val p = graft.operators.Clustering.kmeansAssign(
      emb, "vec_id", "embedding", k = 8, iters = 0, literalMaxTerms = 0)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_nearest_center"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    assert(p.length < 20000, s"plan rendering must stay O(1) in k, got ${p.length} chars")
  }

  test("large-nCentroids IVF: native probe path keeps the <=2-exchange contract") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val p = graft.operators.SimilaritySearch.ivfNeighbors(
      emb, "vec_id", "embedding", dim = 64, nCentroids = 16, nProbe = 2, k = 3,
      literalMaxTerms = 0)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_nearest_centers"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q29: correlated subquery decorrelates to ONE aggregate exchange, no per-row re-scan") {
    val p = plan("q29_correlated_subquery")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the per-customer aggregate is the only hash exchange; the filter
    // rides the join as a residual predicate, never a row-at-a-time
    // re-execution of the subquery
    assert(p.contains("partial_sum"), p)
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex === 1, s"$ex hash exchanges:\n$p")
  }

  test("q30: INTERSECT/EXCEPT ALL plan as counted aggregates + replicate_rows, not joins") {
    val p = plan("q30_set_ops_all")
    // multiset semantics = per-key occurrence counts replicated back out;
    // a join-based plan would lose counts or go quadratic on hot keys
    assert("replicaterows".r.findAllIn(p).length === 2, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("dd_spans: inverted-index join, in-row island fold, map-side span argmax") {
    val p = plan("dd_spans")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loops are the 1-row df-limit broadcasts the skew
    // guard cross-joins in (one per side of the self-join, same shape as
    // the Jaccard guard) — the candidate join itself must stay an
    // equi-join on the 60-bit md5 shingle key (never the 40-80 B string)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2, p)
    assert(p.contains("SortMergeJoin [h#") || p.contains("ShuffledHashJoin [h#"), p)
    // island detection is the round-9 one-exchange shape: matches group
    // to (pair, diagonal) — the bounded-buffer key — with a partial
    // collect_list of primitive long positions, and the sorted list
    // folds to islands IN-ROW; a sort-based row_number window here
    // would be the old two-pass plan sneaking back
    assert(p.contains("collect_list"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("diag"), p)
    // per-pair longest-span argmax is a partial (map-side combinable)
    // struct max, not a second window
    assert(p.contains("partial_max(struct(l"), p)
  }

  test("dd_minhash_incremental: one banded equi-join, no in-row pair expansion") {
    val p = plan("dd_minhash_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // delta×corpus candidates come from ONE (band,bkey) equi-join over
    // the two banded projections — not the groupBy+collect_list in-row
    // enumeration the self-dedup path uses
    assert(!p.contains("collect_list"), p)
    assert(p.contains("bkey"), p)
    // per-pair collapse is a partial (map-side) max of the estimate
    assert(p.contains("partial_max"), p)
  }

  test("ss_ann_pq: ADC stage is projection + TakeOrdered, no shuffle, no window") {
    val p = plan("ss_ann_pq")
    // codebooks are plan literals: search = corpus scan → reconstruction
    // dot → rerank-pool TakeOrdered → exact re-rank of O(rerank) rows;
    // a hash exchange or window here would mean the index had stopped
    // being map-side
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the 1-row query-vector broadcast (the
    // bruteForceTopK convention)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, p)
  }

  test("incremental dedup family: one equi-join against the corpus index, nothing quadratic") {
    // spans: candidates from the 60-bit h-key join; diagonal-bounded
    // windows; the per-pair argmax stays a map-side struct max
    val ps = plan("dd_spans_incremental")
    assert(!ps.contains("CartesianProduct"), ps)
    assert("BroadcastNestedLoopJoin".r.findAllIn(ps).length <= 1, ps) // df-limit broadcast
    // the candidate join is an EQUI-join on the 60-bit key in any
    // physical strategy — a small delta legitimately broadcasts
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[h#".r
      .findFirstIn(ps).isDefined, ps)
    assert(ps.contains("partial_max(struct(l"), ps)
    // simhash: banded (band, bkey) equi-join + map-side Hamming collapse
    val ph = plan("dd_simhash_incremental")
    assert(!ph.contains("CartesianProduct") && !ph.contains("BroadcastNestedLoopJoin"), ph)
    assert(ph.contains("bkey"), ph)
    assert(ph.contains("partial_max"), ph)
    // embeddings: one bucket equi-join; per-delta top-k via the typed
    // aggregator (partial objectagg), never a window over all pairs
    val pe = plan("dd_embedding_incremental")
    assert(!pe.contains("CartesianProduct") && !pe.contains("BroadcastNestedLoopJoin"), pe)
    assert(pe.contains("bucket"), pe)
    assert(!pe.contains("windowspecdefinition(delta_id"), pe)
  }

  test("ss_bm25: scoring reads the checkpointed narrow frame, not a second corpus scan") {
    // the (id, dl, tf...) frame materializes once; stats and scoring
    // both read it back — a FileScan of documents in the SCORING plan
    // would mean the tokenize+count pass runs twice again
    val p = plan("ss_bm25")
    assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"), p)
    assert(!p.contains("documents.parquet"), s"scoring must not re-scan the corpus:\n$p")
  }

  test("dd_keep_best: per-cluster argmax is an aggregate, never a window sort") {
    val p = plan("dd_keep_best")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // a window-rank argmax would sort each duplicate cluster in one
    // partition — a million-member cluster must instead cost O(1)
    // aggregation state per task
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("partial_max(struct(q"), p)
  }
}
