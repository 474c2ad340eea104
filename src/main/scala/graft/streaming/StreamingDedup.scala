package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming MinHash near-duplicate detection — the streaming twin of
  * `Dedup.minhashPairs` for continuous ingestion (the batch operator's
  * keep/drop decision, made at arrival time instead of in a nightly
  * sweep).
  *
  * Semantics (closed-form, anchored to the batch operator in spec): a
  * document is flagged iff its signature est-Jaccard ≥ `threshold`
  * against ANY earlier-arrived document it shares an LSH band bucket
  * with, within the watermark horizon. Earlier documents register
  * whether or not they were themselves flagged — so a doc similar only
  * to an already-flagged near-dup still drops (duplicate-CLUSTER
  * semantics, the same greedy the batch pipeline's connected-components
  * pass applies). On a bounded replay this makes the flagged set exactly
  * `{doc_b | (doc_a, doc_b) ∈ minhashPairs}` when arrival order follows
  * id order.
  *
  * Scale design: signatures and band keys are the SAME zero-shuffle
  * projection as the batch path (one codegen'd `graft_minhash` call);
  * the only stateful shuffle keys on the band bucket — the minimum
  * communication for the problem, identical to the batch plan's one
  * exchange. State per bucket is the (doc_id, arrival, signature) list
  * of members inside the horizon: pruned by event time on every visit
  * and reclaimed whole by EventTimeTimeout, so state is bounded by
  * bucket occupancy within the horizon — the only retention contract
  * that survives at stream scale. A doc flagged in several bands emits
  * one notice per matching band; consumers treat notice-presence as the
  * drop signal (dedup of notices would cost a second stateful shuffle).
  */
object StreamingDedup {

  case class BandRow(
      bkey: String, doc_id: Long, event_time: java.sql.Timestamp, sig: Seq[Long])
  case class BucketState(members: List[(Long, Long, Seq[Long])]) // (doc, arrivalMs, sig)
  case class DupNotice(
      doc_id: Long, event_time: java.sql.Timestamp, matched_doc_id: Long)

  /** Duplicate notices for `docs` (a STREAMING DataFrame carrying
    * `idCol`, `textCol` and an event-time `timeCol`). `horizonMinutes`
    * is both the watermark and the dedup memory.
    *
    * `fingerprintShortDocs`: documents with fewer than `n` tokens have
    * no shingles and are silently excluded by default (the batch
    * anchor, minhashPairs, excludes them the same way). With the flag
    * on they instead carry a constant signature derived from
    * md5(lower(trim(text))) and occupy a single fingerprint band — so
    * EXACT copies of short documents are flagged at est 1.0 while
    * distinct short documents share no bucket. This is the streaming
    * twin of a batch exact-dedup stage for the sub-shingle regime
    * (used by StreamingCuration). */
  def minhashDupStream(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      timeCol: String = "timestamp", horizonMinutes: Int = 10,
      n: Int = Dedup.DefaultShingleN, k: Int = Dedup.DefaultMinhashK,
      bands: Int = Dedup.DefaultMinhashBands,
      threshold: Double = Dedup.DefaultMinhashThreshold,
      fast: Boolean = false,
      fingerprintShortDocs: Boolean = false): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    require(horizonMinutes >= 1)
    import spark.implicits._
    import graft.functions.TextFunctions._
    graft.GraftExtensions.register(spark)
    val r = k / bands
    val horizonMs = horizonMinutes * 60 * 1000L

    // identical signature + band-key projection to Dedup.minhashPairs —
    // zero shuffles, codegen'd; the band index is folded into the key so
    // one stateful operator covers all bands
    val isLong = size(col("toks")) >= n
    // 60-bit fingerprint (15 md5 hex chars) repeated k times: identical
    // short docs agree on every component (est 1.0); the single "F" band
    // keeps their state footprint at one bucket row per doc
    val fpSig = array_repeat(
      conv(substring(md5(lower(trim(col("__text")))), 1, 15), 16, 10).cast("long"), k)
    val sigExpr =
      if (!fingerprintShortDocs)
        call_function("graft_minhash",
          shinglesFromTokens(col("toks"), n), lit(k), lit(fast))
      else when(isLong,
        call_function("graft_minhash",
          shinglesFromTokens(col("toks"), n), lit(k), lit(fast)))
        .otherwise(fpSig)
    val bandIdx =
      if (!fingerprintShortDocs) sequence(lit(0), lit(bands - 1))
      else when(isLong, sequence(lit(0), lit(bands - 1))).otherwise(sequence(lit(0), lit(0)))
    val prefix = (i: Column) =>
      if (!fingerprintShortDocs) i.cast("string")
      else when(isLong, i.cast("string")).otherwise(lit("F"))
    val banded = docs
      .withColumn("event_time", to_timestamp(col(timeCol)))
      .withWatermark("event_time", s"$horizonMinutes minutes")
      .select(col(idCol).cast("long").as("doc_id"), col("event_time"),
        col(textCol).as("__text"), tokens(col(textCol)).as("toks"))
      .filter(if (fingerprintShortDocs) lit(true) else isLong)
      .select(col("doc_id"), col("event_time"), col("toks"), col("__text"),
        // `fast` swaps md5 for xxhash64 exactly like the batch operator
        // (the production mode when no cross-engine anchor is needed)
        sigExpr.as("sig"))
      .select(col("doc_id"), col("event_time"), col("sig"), col("toks"), col("__text"),
        explode(transform(bandIdx, i =>
          concat(prefix(i), lit(":"),
            array_join(slice(col("sig"), i * r + 1, lit(r)).cast("array<string>"), "_"))))
          .as("bkey"))
      .select(col("bkey"), col("doc_id"), col("event_time"), col("sig"))
      .as[BandRow]

    def est(a: Seq[Long], b: Seq[Long]): Double =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / k

    banded
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[BucketState, DupNotice](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // every member is past the horizon (timeout fires at
            // newest+horizon) — reclaim the bucket outright
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            var members = state.getOption.map(_.members).getOrElse(Nil)
              .filter(_._2 >= wm - horizonMs)
            val out = List.newBuilder[DupNotice]
            // arrival order within the micro-batch: (event_time, doc_id)
            rows.toSeq.sortBy(e => (e.event_time.getTime, e.doc_id)).foreach { e =>
              val t = e.event_time.getTime
              // first matching member only: one notice per (doc, band) —
              // a hot duplicate cluster must not emit O(bucket occupancy)
              // notices per arrival. `t - at <= horizonMs` enforces the
              // horizon EXACTLY: watermark pruning alone leaves members
              // farther apart than the horizon visible when both arrive
              // before the watermark advances (e.g. in one micro-batch),
              // so it remains purely a state bound, not the semantics
              members.iterator
                .find { case (d, at, s) =>
                  d != e.doc_id && at <= t && t - at <= horizonMs &&
                    est(s, e.sig) >= threshold }
                .foreach { case (d, _, _) => out += DupNotice(e.doc_id, e.event_time, d) }
              members = (e.doc_id, t, e.sig) :: members
            }
            state.update(BucketState(members))
            val newest = members.iterator.map(_._2).max
            state.setTimeoutTimestamp(math.max(newest + horizonMs, wm + 1))
            out.result().iterator
          }
      }.toDF()
  }
}
