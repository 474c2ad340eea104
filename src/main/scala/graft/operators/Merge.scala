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
    * `is_current: boolean`. `updates` carries `keyCol` + `trackedCols`.
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
  def scd2Merge(
      dim: DataFrame, updates: DataFrame, keyCol: String,
      trackedCols: Seq[String], attrCols: Seq[String],
      effectiveDate: String, endOfTime: String = "9999-12-31"): DataFrame = {
    require(trackedCols.nonEmpty, "scd2Merge needs at least one tracked column")
    val outCols: Seq[String] =
      (keyCol +: attrCols) ++ trackedCols ++ Seq("valid_from", "valid_to", "is_current")
    def named(cs: Seq[Column]): Seq[Column] =
      cs.zip(outCols).map { case (c, n) => c.as(n) }

    val history = dim.filter(!col("is_current")).select(outCols.map(col): _*)
    val current = dim.filter(col("is_current"))

    val joined = current.as("c")
      .join(updates.as("u"), col(s"c.$keyCol") === col(s"u.$keyCol"), "full_outer")
    val hasC = col(s"c.$keyCol").isNotNull
    val hasU = col(s"u.$keyCol").isNotNull
    val changed = trackedCols.map(t => !(col(s"c.$t") <=> col(s"u.$t"))).reduce(_ || _)

    val kept = joined.filter(hasC && (!hasU || !changed))
      .select(outCols.map(n => col(s"c.$n")): _*)
    val closed = joined.filter(hasC && hasU && changed)
      .select(named(
        (col(s"c.$keyCol") +: attrCols.map(a => col(s"c.$a"))) ++
          trackedCols.map(t => col(s"c.$t")) ++
          Seq(col("c.valid_from"), to_date(lit(effectiveDate)), lit(false))): _*)
    val opened = joined.filter(hasU && (!hasC || changed))
      .select(named(
        (col(s"u.$keyCol") +: attrCols.map(a => col(s"c.$a"))) ++
          trackedCols.map(t => col(s"u.$t")) ++
          Seq(to_date(lit(effectiveDate)), to_date(lit(endOfTime)), lit(true))): _*)

    history.unionByName(kept).unionByName(closed).unionByName(opened)
  }
}
