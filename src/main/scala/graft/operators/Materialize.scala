package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Central mid-plan materialization primitive — the durability knob the
  * batch operators share for "compute this subtree once, several
  * consumers read it" stages (posting tables, survivor frames, round
  * state).
  *
  * Postures, selected by the session conf `spark.graft.materialize`:
  *
  *   - `local` (default): `localCheckpoint(eager = false)` — zero extra
  *     I/O, lineage truncation, blocks live in executor storage. The
  *     right call on a healthy single-app cluster and the only viable
  *     one on local[n]; NOT replicated, so on a lossy-executor fleet a
  *     lost executor kills the lineage-truncated block with no recompute
  *     path (the round-14 verdict's durability caveat).
  *   - `disk`: `persist(DISK_ONLY_2)` — 2×-replicated on-disk blocks;
  *     survives any single executor loss and keeps lineage, so even a
  *     double loss recomputes instead of failing. The documented posture
  *     for preemptible/spot fleets.
  *   - `reliable`: `checkpoint(eager = false)` — writes to the
  *     SparkContext checkpoint dir (HDFS/object store); survives any
  *     executor loss. Requires `sparkContext.setCheckpointDir` first;
  *     the strongest (and slowest) posture, for multi-hour lineages.
  *
  * The knob changes WHERE the materialized bytes live, never the bytes:
  * every oracle gate hashes identically under all three. */
object Materialize {

  val ConfKey = "spark.graft.materialize"

  /** Materialize `df` under the session's configured posture. `eager`
    * mirrors localCheckpoint's flag: true forces the job now (round
    * loops that MUST cut lineage before the next iteration), false
    * defers to the first action. */
  def stage(df: DataFrame, eager: Boolean = false): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "disk" =>
        val p = df.persist(StorageLevel.DISK_ONLY_2)
        if (eager) {
          // eager call sites are ROUND LOOPS (label propagation, Lloyd):
          // persist alone keeps the logical plan, so each iteration's
          // plan nests the last — O(iters) analysis cost on the driver.
          // Re-rooting on the persisted RDD cuts Catalyst lineage to a
          // single LogicalRDD per round (localCheckpoint gives the same
          // truncation for free); the RDD still reads the 2×-replicated
          // disk blocks, so the durability posture is unchanged
          // (round-15 ADVICE)
          p.count()
          df.sparkSession.createDataFrame(p.rdd, p.schema)
        } else p
      case "reliable" => df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }
}
