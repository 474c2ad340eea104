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
    staged(df, eager)._1

  /** [[stage]] plus a RELEASE handle for the pin it creates. Round
    * loops (label propagation, Lloyd) stage every iteration and must
    * release the superseded round's pin once its successor is
    * materialized: under `disk` a Dataset.persist registers in the
    * CacheManager, which holds the reference — without an explicit
    * unpersist the replicated disk blocks of EVERY round accumulate for
    * the app lifetime (round-16 ADVICE; the eager re-root of round 16
    * had additionally hidden the persisted handle the unpersist needs,
    * which this API restores). Under `local`/`reliable` release is a
    * no-op by design: a localCheckpoint's blocks are reclaimed by the
    * ContextCleaner once the superseded frame is unreferenced (no
    * CacheManager entry pins them — an explicit unpersist there would
    * race reads of a frame a caller still holds), and a reliable
    * checkpoint's files are the durability contract itself.
    *
    * The `disk`+eager pin is read back through a Row↔InternalRow
    * round trip (createDataFrame over p.rdd — the public re-rooting
    * surface): a per-read serde cost that is the documented price of
    * the replicated-durability posture; `local` (the default) re-roots
    * serde-free via localCheckpoint. */
  def staged(df: DataFrame, eager: Boolean = false): (DataFrame, () => Unit) =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "disk" =>
        val p = df.persist(StorageLevel.DISK_ONLY_2)
        val release = () => { p.unpersist(); () }
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
          (df.sparkSession.createDataFrame(p.rdd, p.schema), release)
        } else (p, release)
      case "reliable" => (df.checkpoint(eager), () => ())
      case _ => (df.localCheckpoint(eager), () => ())
    }
}
