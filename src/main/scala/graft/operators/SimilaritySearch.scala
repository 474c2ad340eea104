package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.functions.VectorFunctions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: brute force is the correctness baseline (a broadcast of
  * the query set + one map-side pass over the corpus — embarrassingly
  * parallel, no shuffle except the final top-k, which TakeOrdered keeps
  * at k·partitions rows). The LSH variant buckets the corpus by
  * random-hyperplane signs so each query only scores its bucket — the
  * 100 TB path where scanning every vector per query is impossible.
  * Hyperplanes derive from a splitmix64 stream, so planes are identical
  * on every executor with zero broadcast state.
  *
  * The LSH candidate plan is ONE pass: bucket → groupBy(bucket) →
  * enumerate + score + top-k inside the group. Because a vector belongs
  * to exactly one bucket per plane table, all its candidates are
  * bucket-local, so the per-vector top-k needs no second shuffle and no
  * window over all candidate pairs (`row_number().over(partitionBy)`
  * would shuffle every candidate pair — the anti-pattern this plan
  * exists to avoid). With multiple plane tables (the recall knob),
  * candidates span tables, and the per-vector top-k is bounded MAP-SIDE
  * by the typed TopKAggregator instead (shuffle carries ≤ k rows per
  * vector per partition, never all pairs).
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors of a single query vector (given as a
    * 1-row DataFrame with column `qvec`). */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int): DataFrame = {
    corpus
      .select(col(idCol).as("vec_id"), asDoubles(col(vecCol)).as("v"))
      .crossJoin(broadcast(query.select(asDoubles(col("qvec")).as("q"))))
      .select(col("vec_id"), cosine(col("v"), col("q")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Bucket count as a function of corpus size: enough hyperplane bits
    * that the EXPECTED bucket holds ~`targetBucketSize` vectors, so the
    * per-bucket pair enumeration stays O(n·targetBucketSize) instead of
    * O(n²/2^nBits) with a constant nBits — the knob a 100× scale-up
    * turns. (Bits cap at 30; beyond that bucket keys should become
    * hashed band tables.) */
  def nBitsFor(corpusSize: Long, targetBucketSize: Int = 256): Int = {
    require(corpusSize > 0 && targetBucketSize > 0)
    val buckets = math.max(1.0, corpusSize.toDouble / targetBucketSize)
    math.min(30, math.max(1, math.ceil(math.log(buckets) / math.log(2)).toInt))
  }

  /** Comparator: cosine descending, neighbor_id ascending — the same
    * total order as `ORDER BY cos DESC, neighbor_id ASC`, so the local
    * top-k matches the window/row_number formulation row-for-row. */
  private def byCosDescIdAsc(l: Column, r: Column): Column =
    when(l.getField("cos") > r.getField("cos"), -1)
      .when(l.getField("cos") < r.getField("cos"), 1)
      .when(l.getField("neighbor_id") < r.getField("neighbor_id"), -1)
      .when(l.getField("neighbor_id") > r.getField("neighbor_id"), 1)
      .otherwise(0)

  /** One projection: id, vector (as doubles), its norm (computed once
    * per vector, not once per candidate pair), bucket key(s). */
  private def bucketedMembers(
      corpus: DataFrame, idCol: String, vecCol: String,
      bucketCols: Seq[Column]): DataFrame =
    corpus
      .select(col(idCol).as("id"), asDoubles(col(vecCol)).as("v"))
      .select(col("id"), col("v"), norm(col("v")).as("nrm"),
        posexplode(array(bucketCols: _*)).as(Seq("tbl", "bucket")))

  /** LSH-bucketed all-pairs neighbor search: every vector is assigned an
    * `nBits`-bit hyperplane bucket; candidates are bucket-mates; each
    * vector keeps its `k` nearest by exact cosine re-rank. Recall is
    * tunable two ways: fewer bits → bigger buckets, and `nTables` > 1
    * independent plane tables → a pair is a candidate if it collides in
    * ANY table (the standard LSH recall amplification). Hyperplanes are
    * plan-time literals (VectorFunctions.hyperplanes) — deterministic,
    * broadcast-free, and DuckDB-oracle-expressible.
    *
    * nBits should scale with the corpus (see `nBitsFor`): candidates per
    * bucket are what a constant bucket count lets grow quadratically. */
  def lshNeighbors(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int = 6, k: Int = 3, nTables: Int = 1): DataFrame = {
    require(nTables >= 1, "nTables must be >= 1")
    // table t's planes draw from a disjoint splitmix64 input range
    val bucketCols = (0 until nTables).map { t =>
      val planes = hyperplanes(nBits, dim, seed = 0x5CA1AB1EL + t * 0x1000000000000L)
      if (nTables == 1) hyperplaneBits(col("v"), planes)
      else concat(lit(s"$t:"), hyperplaneBits(col("v"), planes))
    }
    val grouped = bucketedMembers(corpus, idCol, vecCol, bucketCols)
      .groupBy("bucket")
      .agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("ms"))
      .filter(size(col("ms")) > 1)

    // per member a: score every bucket-mate once (norms precomputed)
    def scored(a: Column): Column = transform(
      filter(col("ms"), b => b.getField("id") =!= a.getField("id")),
      b => struct(
        (dot(a.getField("v"), b.getField("v")) /
          (a.getField("nrm") * b.getField("nrm"))).as("cos"),
        b.getField("id").as("neighbor_id")))

    if (nTables == 1) {
      // single table ⇒ all of a's candidates sit in this one group row:
      // sort + slice k INSIDE the group — the whole query is one shuffle
      val topk = transform(col("ms"), a =>
        transform(
          slice(array_sort(scored(a), byCosDescIdAsc), 1, k),
          c => struct(
            a.getField("id").as("vec_id"),
            c.getField("neighbor_id").as("neighbor_id"),
            c.getField("cos").as("cos"))))
      grouped.select(explode(flatten(topk)).as("p"))
        .select(col("p.vec_id").as("vec_id"),
          col("p.neighbor_id").as("neighbor_id"), col("p.cos"))
    } else {
      // multi-table ⇒ a's candidates span tables: bound the per-vector
      // top-k map-side with the typed aggregator (duplicate candidates
      // from multiple colliding tables collapse inside its ≤k buffer —
      // no global dropDuplicates shuffle needed). neighbor_id is negated
      // so the ascending buffer order drops the LARGER id on cosine ties,
      // matching `ORDER BY cos DESC, neighbor_id ASC`.
      val pairs = grouped.select(explode(flatten(transform(col("ms"), a =>
        transform(scored(a), c => struct(
          a.getField("id").as("vec_id"),
          c.getField("neighbor_id").as("neighbor_id"),
          c.getField("cos").as("cos")))))).as("p"))
        .select(col("p.vec_id").cast("long").as("vec_id"),
          col("p.cos").as("cos"), col("p.neighbor_id").cast("long").as("neighbor_id"))
      val spark = corpus.sparkSession
      import spark.implicits._
      pairs.as[(Long, Double, Long)]
        .map { case (vid, cos, nid) => (vid, (cos, -nid)) }
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new TopKAggregator(k).toColumn.name("top"))
        .flatMap { case (vid, top) =>
          top.map { case (cos, negId) => (vid, -negId, cos) } }
        .toDF("vec_id", "neighbor_id", "cos")
    }
  }
}
