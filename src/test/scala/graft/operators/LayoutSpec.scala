package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class LayoutSpec extends SparkSpecBase {

  import spark.implicits._

  test("zorderKey is a bijection on the bit-bounded grid") {
    val n = 32
    val grid = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    val keys = grid.toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y"), bitsPer = 5).as("z"))
      .collect().map(_.getLong(0))
    assert(keys.distinct.length === n * n, "interleave must not collide")
    assert(keys.min === 0L && keys.max === (1L << 10) - 1,
      "keys must cover exactly the 2·bitsPer-bit range")
  }

  test("z-order layout bounds per-file extent in BOTH dimensions") {
    // uniform 2-d grid: ids 0..4095 mapped to (x = id % 64, y = id / 64)
    val df = (0L until 4096L).map(i => (i % 64, i / 64)).toDF("x", "y")
    val dir = Files.createTempDirectory("graft_zorder").toString

    def meanExtents(path: String): (Double, Double) = {
      val byFile = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .collect()
      (byFile.map(_.getLong(1)).sum.toDouble / byFile.length,
        byFile.map(_.getLong(2)).sum.toDouble / byFile.length)
    }

    Layout.zorderWrite(df, "x", "y", nFiles = 16, path = s"$dir/z", bitsPer = 6)
    val (zx, zy) = meanExtents(s"$dir/z")

    // the single-column-sort baseline: perfect on x, useless on y
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/x")
    val (sx, sy) = meanExtents(s"$dir/x")

    // z-order: both extents well under the global 63; single-sort: y
    // extent stays at the global range (no pruning on that axis)
    assert(zx <= 32 && zy <= 32, s"z-order extents ($zx, $zy) not bounded")
    assert(sy >= 55, s"baseline should be unclustered in y, got $sy")
    assert(zy < sy / 2, s"z-order y-extent $zy must beat single-sort $sy")
  }
}
