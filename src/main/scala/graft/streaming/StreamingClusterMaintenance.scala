package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Streaming duplicate-CLUSTER maintenance — the live composition of
  * the streaming dedup detectors and the O(Δ) label merge: the
  * detectors ([[StreamingDedup.minhashDupStream]] and its embedding /
  * pHash siblings) emit `(doc_id, matched_doc_id)` notices, each
  * naming ONE earlier in-horizon cluster member (the cluster-greedy
  * contract), so the notice graph is a forest whose components ARE the
  * arrival-time duplicate clusters — and every micro-batch of notices
  * folds into the persisted `(doc_id, cluster_id)` labels through
  * [[Dedup.mergeClustersIncremental]]: all merge work on the tiny
  * label graph, the standing labels streamed twice and shuffled never.
  *
  * foreachBatch DELIBERATELY (the StreamingAnn convention): the fold's
  * point is read-labels → tiny merge → atomic rewrite, a per-batch
  * read-modify-write no stateful streaming operator expresses — and
  * the micro-batch body IS the batch operator, so the two postures
  * cannot drift. At-least-once replay is SAFE BY ALGEBRA, not by
  * bookkeeping: re-merging an already-merged pair finds both endpoints
  * in one component (a label self-loop) and changes nothing — the
  * dormant-posture property DedupSpec pins.
  *
  * State is the labels table itself (parquet at `labelsPath`), so a
  * restart resumes from the last committed fold; the per-batch rewrite
  * is eager-materialize-then-overwrite (the HeavyHitters.appendToIndex
  * convention — rows leave the old files before they are deleted). */
object StreamingClusterMaintenance {

  val labelsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("cluster_id", LongType)))

  /** Current labels at `labelsPath` — empty-but-typed before the first
    * fold, so first-batch reads need no special casing. */
  def readLabels(spark: SparkSession, labelsPath: String): DataFrame = {
    val hasData = graft.store.Storage.listObjects(spark, labelsPath)
      .exists(_.endsWith(".parquet"))
    if (hasData) spark.read.schema(labelsSchema).parquet(labelsPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], labelsSchema)
  }

  /** One fold: merge a batch of `(doc_id, matched_doc_id)` notice rows
    * into the labels table. Exposed for direct batch use and reused
    * verbatim by the streaming writer below. */
  def foldNotices(spark: SparkSession, notices: DataFrame,
      labelsPath: String): Unit = {
    val pairs = notices
      .select(col("doc_id").as("doc_a"), col("matched_doc_id").as("doc_b"))
      .filter(col("doc_a").isNotNull && col("doc_b").isNotNull)
    if (pairs.isEmpty) return
    val merged = Dedup.mergeClustersIncremental(
      readLabels(spark, labelsPath), pairs)
      // EAGER: materialize off the old files before overwrite deletes them
      .localCheckpoint()
    merged.write.mode("overwrite").parquet(labelsPath)
  }

  /** The streaming writer: each micro-batch of dup notices folds into
    * the labels table. Caller starts it with its own checkpoint dir:
    * `maintainClusters(spark, notices, path).option("checkpointLocation",
    * …).start()`. */
  def maintainClusters(spark: SparkSession, notices: DataFrame,
      labelsPath: String): DataStreamWriter[org.apache.spark.sql.Row] =
    notices.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) => foldNotices(spark, batch, labelsPath)
    }
}
