package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental upsert/merge operators — the CDC ingestion layer of a
  * large warehouse: applying a batch of changed rows to a dimension
  * while preserving history (slowly-changing-dimension type 2).
  *
  * Scale design: the merge is ONE equi-join between the CURRENT slice of
  * the dimension and the (much smaller) update batch — broadcast when
  * the batch fits, shuffle-on-key otherwise. Closed history rows are
  * never read or rewritten (`is_current` is the partition predicate a
  * production table would prune on), so merge cost is proportional to
  * |current| + |updates|, not table history.
  */
object Merge {

  /** SCD2 merge of `updates` into `dim`.
    *
    * `dim` carries `keyCol`, `attrCols` (carried attributes, not change-
    * tracked), `trackedCols` (change-tracked values), and the SCD2
    * bookkeeping columns `valid_from: date`, `valid_to: date`,
    * `is_current: boolean`. `updates` carries `keyCol` + `trackedCols`,
    * AT MOST ONE ROW PER KEY — duplicates raise at execution (standard
    * SQL MERGE semantics; a silent fan-out would duplicate history and
    * open two current rows).
    *
    * Semantics (per key):
    *   - history rows (`is_current = false`): untouched;
    *   - current row without an update: untouched;
    *   - current row whose tracked values all equal the update: untouched
    *     (no-op change suppression — null-safe comparison);
    *   - current row with a real change: CLOSED (`valid_to :=
    *     effectiveDate`, `is_current := false`) and a new current row
    *     opened with the update's values (attributes carry over);
    *   - update key absent from the dimension: new current row inserted
    *     (attributes null).
    */
  /** The SCD2 output shape — ONE definition shared by the history
    * passthrough and the delta path, so the unionByName sides cannot
    * silently diverge. */
  private def scd2OutCols(
      keyCol: String, trackedCols: Seq[String], attrCols: Seq[String]): Seq[String] =
    (keyCol +: attrCols) ++ trackedCols ++ Seq("valid_from", "valid_to", "is_current")

  def scd2Merge(
      dim: DataFrame, updates: DataFrame, keyCol: String,
      trackedCols: Seq[String], attrCols: Seq[String],
      effectiveDate: String, endOfTime: String = "9999-12-31"): DataFrame = {
    val outCols = scd2OutCols(keyCol, trackedCols, attrCols)
    val history = dim.filter(!col("is_current")).select(outCols.map(col): _*)
    history.unionByName(scd2MergeDelta(
      dim, updates, keyCol, trackedCols, attrCols, effectiveDate, endOfTime))
  }

  /** The REWRITTEN rows only — the partition-aware write path of
    * scd2Merge. On a dimension stored `PARTITIONED BY (is_current)` this
    * plan's only dim scan carries `is_current = true` as a partition
    * filter, so closed history — the overwhelming bulk of an old
    * dimension — is pruned at file-listing time, never read (asserted in
    * MergeSpec; scd2Merge's full output additionally unions the history
    * passthrough, which a full-table rewrite would re-copy anyway).
    *
    * Write protocol for the delta (what a production merge job runs):
    * APPEND `filter(!is_current)` (the newly-closed versions) to the
    * history partition; dynamic-partition-OVERWRITE the current
    * partition with `filter(is_current)`. Merge cost is then
    * |current| + |updates| in both read and write, independent of
    * accumulated history — the property MergeSpec replays end-to-end. */
  def scd2MergeDelta(
      dim: DataFrame, updates: DataFrame, keyCol: String,
      trackedCols: Seq[String], attrCols: Seq[String],
      effectiveDate: String, endOfTime: String = "9999-12-31"): DataFrame = {
    require(trackedCols.nonEmpty, "scd2Merge needs at least one tracked column")
    val outCols = scd2OutCols(keyCol, trackedCols, attrCols)

    val current = dim.filter(col("is_current"))

    // SQL MERGE semantics: several update rows for one key is an error,
    // not a silent fan-out (the full-outer join would duplicate the
    // closed row and open TWO current rows). Enforced in-plan with a
    // window count + raise_error — no extra action, one pass over the
    // (small) batch.
    val perKey = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol)))
    // the guard lives INSIDE the join key so column pruning can't drop it
    val guardedKey = when(perKey > 1,
      raise_error(concat(lit("scd2Merge: multiple update rows for key "),
        col(keyCol).cast("string"))))
      .otherwise(col(keyCol))
    val uniqueUpdates = updates.select(
      (guardedKey.as(keyCol) +: trackedCols.map(col)): _*)

    val joined = current.as("c")
      .join(uniqueUpdates.as("u"), col(s"c.$keyCol") === col(s"u.$keyCol"), "full_outer")
    val hasC = col(s"c.$keyCol").isNotNull
    val hasU = col(s"u.$keyCol").isNotNull
    val changed = trackedCols.map(t => !(col(s"c.$t") <=> col(s"u.$t"))).reduce(_ || _)

    // ONE pass over the joined rows: each emits its 1-2 output versions
    // through an exploded array (three filtered union branches would
    // execute the join itself three times — branch dedup only reuses the
    // exchanges below it, not the join compute)
    def version(cs: Seq[Column]): Column =
      struct(cs.zip(outCols).map { case (c, n) => c.as(n) }: _*)
    val keptRow = version(outCols.map(n => col(s"c.$n")))
    val closedRow = version(
      (col(s"c.$keyCol") +: attrCols.map(a => col(s"c.$a"))) ++
        trackedCols.map(t => col(s"c.$t")) ++
        Seq(col("c.valid_from"), to_date(lit(effectiveDate)), lit(false)))
    val openedRow = version(
      (coalesce(col(s"u.$keyCol"), col(s"c.$keyCol")) +: attrCols.map(a => col(s"c.$a"))) ++
        trackedCols.map(t => col(s"u.$t")) ++
        Seq(to_date(lit(effectiveDate)), to_date(lit(endOfTime)), lit(true)))
    val versions =
      when(hasC && (!hasU || !changed), array(keptRow))
        .when(hasC && hasU && changed, array(closedRow, openedRow))
        .otherwise(array(openedRow))
    joined
      .select(explode(versions).as("__v"))
      .select(outCols.map(n => col(s"__v.$n")): _*)
  }
}
