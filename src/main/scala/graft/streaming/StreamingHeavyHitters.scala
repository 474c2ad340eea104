package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.HeavyHitters

/** Streaming heavy hitters — the arrival-time twin of
  * `HeavyHitters.heavyHitters`, completing the sketch family's twin
  * coverage (spans: `StreamingSpanDedup`; MinHash/embedding:
  * `StreamingDedup`; admission: `StreamingTokenBudget`).
  *
  * Architecture — the two-sink split the span twin established,
  * because an EXACT heavy-hitter verdict is not per-arrival-decidable
  * (a gram's global count keeps moving):
  *
  *   1. [[candidateStream]] (streaming, ONE stateful operator): the
  *      gram space hash-partitions into `nShards` bounded shards; each
  *      shard holds a Misra–Gries summary in state — capacity
  *      counters + the shard's running occurrence total — updated by
  *      the SAME fold the batch operator's partition pass runs
  *      (`HeavyHitters.mgUpdate`, shared so the two postures cannot
  *      drift). Every visited shard emits its refreshed summary
  *      snapshot; sink them.
  *   2. [[heavyHittersFromSummaries]] (batch, at finalization): the
  *      LATEST snapshot per shard (totals are strictly monotone, so
  *      max_by(total) is it) yields the candidate superset and the
  *      exact stream total; the batch verification pass then counts
  *      candidates exactly over the archived corpus — the same
  *      phase 2 the batch operator runs, so the finalized answer
  *      EQUALS `heavyHitters` on the replayed corpus row for row
  *      (StreamingHeavyHittersSpec).
  *
  * Why sharding preserves the guarantee: every occurrence of a gram
  * routes to one shard (the shard key is a pure function of the gram),
  * so the shard's substream contains the gram's WHOLE count, and
  * sequential Misra–Gries with `capacity` counters over that substream
  * retains any gram with count > shard_total/capacity ≥ — a fortiori —
  * anything with count ≥ φ·N when capacity > 1/φ (shard_total ≤ N).
  * Incremental batches ARE the sequential stream: MG is one-pass by
  * construction, so cross-batch state continuation loses nothing.
  *
  * State contract: exactly `nShards` groups forever (no timeout
  * needed — the state is the summary itself, not per-arrival data),
  * each bounded at `capacity` counters — total state
  * O(nShards × capacity) whatever the stream length. Each snapshot row
  * carries its capacity so finalization can VALIDATE φ against what
  * the stream actually ran with (the `_hh_meta.txt` sidecar lesson:
  * knobs that silently weaken a guarantee must travel with the data).
  */
object StreamingHeavyHitters {

  case class GramRow(shard: Int, gram: String)
  case class ShardState(total: Long, grams: Array[String], counts: Array[Long])
  case class ShardSummary(
      shard: Int, capacity: Int, total: Long,
      grams: Array[String], counts: Array[Long])

  /** The streaming half: per-shard Misra–Gries summaries over word
    * `n`-grams of `textCol`. `docs` is a STREAMING DataFrame; emits a
    * [[ShardSummary]] snapshot per visited shard per micro-batch. */
  def candidateStream(
      spark: SparkSession, docs: DataFrame, textCol: String,
      n: Int = 2, capacity: Int = 2048, nShards: Int = 64): Dataset[ShardSummary] = {
    require(capacity >= 2 && nShards >= 1)
    import spark.implicits._
    import graft.functions.TextFunctions._

    val grams = docs
      .select(tokens(col(textCol)).as("toks"))
      // outer + null-drop: skips InferFiltersFromGenerate (see
      // HeavyHitters.gramStream — same projection)
      .select(explode_outer(positionalShingles(col("toks"), n)).as("gram"))
      .filter(col("gram").isNotNull)
      .select(pmod(shingleKey(col("gram")), lit(nShards.toLong))
        .cast("int").as("shard"), col("gram"))
      .as[GramRow]

    grams
      .groupByKey(_.shard)
      .flatMapGroupsWithState[ShardState, ShardSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[GramRow], state: GroupState[ShardState]) =>
          val m = new mutable.HashMap[String, Long]()
          val prev = state.getOption
          prev.foreach(s => s.grams.zip(s.counts).foreach { case (g, c) => m.update(g, c) })
          val seen = HeavyHitters.mgUpdate(m, rows.map(_.gram), capacity)
          val total = prev.map(_.total).getOrElse(0L) + seen
          val kept = m.toArray
          state.update(ShardState(total, kept.map(_._1), kept.map(_._2)))
          Iterator.single(ShardSummary(
            shard, capacity, total, kept.map(_._1), kept.map(_._2)))
      }
  }

  /** The batch half: exact heavy hitters at `phi` from the summary
    * sink plus the archived corpus. Validates `phi` against the
    * capacity the stream ran with, takes the latest snapshot per shard
    * (max_by on the monotone total), and runs the batch operator's own
    * exact verification over the corpus. */
  def heavyHittersFromSummaries(
      summaries: DataFrame, corpus: DataFrame, textCol: String,
      n: Int, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val capMin = summaries.agg(min(col("capacity"))).head.getInt(0)
    require(capMin > 1.0 / phi,
      s"stream ran with capacity $capMin — cannot serve phi=$phi exactly " +
        s"(needs capacity > ${1 / phi})")
    val latest = summaries.groupBy("shard")
      .agg(max_by(struct(col("total"), col("grams")), col("total")).as("b"))
    val totalDf = latest.agg(sum(col("b.total")).as("n_total"))
    val candidates = latest
      .select(explode(col("b.grams")).as("gram")).distinct()
    HeavyHitters.verifyExact(
      HeavyHitters.gramStream(corpus, textCol, n), candidates, totalDf, phi)
  }
}
