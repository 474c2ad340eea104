package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: decompose mm_curate's scale behavior — pair counts
  * and per-stage times at two SFs. `runMain graft.tools.MmProfile
  * [dirA dirB]`. Written to root-cause the round-16 sf1 sweep's
  * superlinear mm_curate (22× per 10× data): is the growth in the
  * candidate-pair count (cross-copy pHash near-dups in the synthetic
  * fixture), the cluster sizes, or the keep-best argmax? */
object MmProfile {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else
      Seq("/root/testdata/sf0.1", "/root/repo/target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Multimodal, PerceptualHash}
    import graft.sources.Tables

    for (dir <- dirs) {
      val media = Multimodal.syntheticImagesFromText(
        Tables.documents(spark, dir).filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text")
      val nMedia = media.count()
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"  $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        r
      }
      println(s"$dir  media=$nMedia")
      val pairsUncapped = timed("pairs maxBucket=None") {
        PerceptualHash.phashPairs(media, maxBucket = None)
          .select("doc_a", "doc_b").count()
      }
      val pairsCapped = timed("pairs default cap") {
        PerceptualHash.phashPairs(media)
          .select("doc_a", "doc_b").count()
      }
      println(s"  pairs uncapped=$pairsUncapped capped=$pairsCapped")
      val curated = timed("curateImages (gate shape)") {
        PerceptualHash.curateImages(media, maxBucket = None).count()
      }
      println(s"  curated rows=$curated")
    }
    spark.stop()
  }
}

/** Temp diagnostic: classify sf1 image pairs as within- vs cross-copy
  * and correlate with doc length. */
object MmPairProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Multimodal, PerceptualHash}
    import graft.sources.Tables
    val docs = Tables.documents(spark, dir).filter(pmod(col("doc_id"), lit(3)) === 0)
    val media = Multimodal.syntheticImagesFromText(docs, "doc_id", "text")
    val pairs = PerceptualHash.phashPairs(media, maxBucket = None)
      .select("doc_a", "doc_b")
    val off = 100000000L
    val lab = pairs.withColumn("cross",
      (col("doc_a") / off).cast("long") =!= (col("doc_b") / off).cast("long"))
    lab.groupBy("cross").count().show()
    // same base doc replicated? (same id mod offset)
    lab.filter(col("cross"))
      .withColumn("samebase", pmod(col("doc_a"), lit(off)) === pmod(col("doc_b"), lit(off)))
      .groupBy("samebase").count().show()
    // length distribution of docs in cross pairs
    val lens = docs.select(col("doc_id"), length(col("text")).as("len"))
    lab.filter(col("cross")).join(lens, col("doc_a") === col("doc_id"))
      .select((col("len") / 100).cast("int").as("lenbin")).groupBy("lenbin").count()
      .orderBy("lenbin").show(50)
    // debiased comparison: does median-equalization deconcentrate?
    def t[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f
      println(f"  $l%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r }
    val nDeb = t("debiased pairs")(
      PerceptualHash.phashPairsDebiased(media, maxBucket = None).count())
    println(s"  debiased pairs=$nDeb")
    // bucket histogram, plain vs debiased signatures
    import graft.operators.Dedup
    val plain = Dedup.packedSignatureBanded(
      PerceptualHash.phashSignatures(media), "media_id", "sig",
      PerceptualHash.PhashBits, PerceptualHash.DefaultPhashBands)
    val deb = Dedup.packedSignatureBanded(
      PerceptualHash.phashSignaturesWithMedians(media,
        PerceptualHash.phashMedians(media)), "media_id", "sig",
      PerceptualHash.PhashBits, PerceptualHash.DefaultPhashBands)
    for ((nm, b) <- Seq("plain" -> plain, "debiased" -> deb)) {
      val top = b.groupBy("band", "bkey").count().orderBy(col("count").desc)
      println(s"  $nm top buckets:"); top.show(5)
    }
    spark.stop()
  }
}
