package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: multi-dimensional clustering via Z-order
  * (Morton) keys. Sorting a table by the interleaved bits of two (or
  * more) filter columns makes every output file narrow in BOTH
  * dimensions, so min/max footer statistics prune files for predicates
  * on EITHER column — the standard layout trick (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`) for 100 TB fact tables queried along more than
  * one axis. A single-column sort gives perfect pruning on one axis and
  * none on the other; Z-order trades a little of each for pruning on
  * both.
  */
object Layout {

  /** Morton key: interleave the low `bitsPer` bits of two non-negative
    * integer columns (x even positions, y odd). Pure integer shifts and
    * adds, unrolled at plan time — codegen-friendly and recomputable in
    * any engine. */
  def zorderKey(x: Column, y: Column, bitsPer: Int = 21): Column = {
    require(bitsPer >= 1 && bitsPer <= 31)
    (0 until bitsPer).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` clustered by the Z-order of (xCol, yCol) into `nFiles`
    * range-partitioned, internally sorted parquet files. Range
    * partitioning (not hash) keeps the key space contiguous per file —
    * that contiguity is what bounds each file's min/max extent in both
    * source dimensions. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, path: String, bitsPer: Int = 21): Unit =
    df.withColumn("__z", zorderKey(col(xCol), col(yCol), bitsPer))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
