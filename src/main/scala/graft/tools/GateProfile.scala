package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: break a recall gate's wall-clock into its component
  * passes (count, truth, approx, final joined row) so optimization goes
  * to the part that actually costs — `runMain graft.tools.GateProfile
  * [sfDir]`. Each component is timed by forcing it in isolation; the
  * "gate" line is the production composition from TrainingDataQueries. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Recall, SimilaritySearch}
    import graft.sources.Tables

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    // honest forcing: noop write evaluates the full plan — count() lets
    // Catalyst ELIMINATE cardinality-preserving subtrees (the gate's
    // left join against a unique-key side drops its entire build
    // subtree under count, round-15 finding), so components are timed
    // by the same action Bench uses
    def w(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val nth = Recall.sampleEveryNthFor(n)
    println(s"$dir  n=$n nth=$nth")
    // warm: JVM + parquet footer caches
    t("warm count")(emb.count())
    for (rep <- 1 to 2) {
      println(s" rep $rep")
      w("truth (sampled bf)")(Recall.bruteForceNeighbors(
        emb, "vec_id", "embedding", k = 3, sampleEveryNth = nth))
      w("approx lsh nBits=1")(SimilaritySearch.lshNeighbors(
        emb, "vec_id", "embedding", dim = 64, nBits = 1, k = 3))
      val bits = math.min(10, SimilaritySearch.nBitsFor(n))
      w(s"approx lsh 1tbl bits=$bits")(SimilaritySearch.lshNeighbors(
        emb, "vec_id", "embedding", dim = 64, nBits = bits, k = 3))
      w(s"approx lsh t8 bits=$bits")(SimilaritySearch.lshNeighbors(
        emb, "vec_id", "embedding", dim = 64, nBits = bits, k = 3, nTables = 8))
      w("approx ivf toy")(SimilaritySearch.ivfNeighbors(
        emb, "vec_id", "embedding", dim = 64, nCentroids = 8, nProbe = 2, k = 3))
      val nc = SimilaritySearch.nCentroidsFor(n)
      w("approx ivf p8 refine=2")(SimilaritySearch.ivfNeighbors(
        emb, "vec_id", "embedding", dim = 64, nCentroids = nc,
        nProbe = math.min(8, nc), k = 3, refineIters = 2))
      for (g <- Seq("ss_recall_lsh", "ss_recall_lsh_t8", "ss_recall_ivf",
          "ss_recall_ivf_p8")) {
        w(s"gate $g")(graft.queries.TrainingDataQueries.queries(g)(spark, dir))
      }
    }
    spark.stop()
  }
}
