package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (backward) join — the event-alignment operator
  * Spark lacks natively: for every left row, the latest right row with
  * `right.ts <= left.ts` in the same key group.
  *
  * Plan shape: tag + union + one window over (key, ts) with a running
  * `last(right_payload, ignoreNulls)` — exactly ONE shuffle (the window
  * exchange on the key), no join explosion, no per-left-row candidate
  * scan. This is the scale-safe formulation: a naive
  * `left JOIN right ON key AND rts <= lts` + argmax produces
  * O(|L|·|R| / keys) intermediate rows, while the union-window carries
  * |L| + |R| rows through a single sort. At 100 TB both sides stream
  * through one exchange partitioned by key.
  *
  * Determinism: right rows tied on ts are ordered by `tieCol`
  * ascending, so the match is the one maximizing (ts, tieCol) — a total
  * order any SQL oracle can reproduce with
  * `row_number() OVER (ORDER BY ts DESC, tie DESC)`.
  */
object AsOfJoin {

  /** Left columns pass through; the matched right row arrives as a
    * (nullable) struct column `asof` with right's schema. */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__tie"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"),
      lit(0).as("__side"), col(tieCol).cast("long").as("__tie"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    // right rows sort before left rows at equal ts (inclusive <=), and
    // among tied right rows the LAST in frame order is the max tieCol
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__m").as("asof")): _*)
  }
}
