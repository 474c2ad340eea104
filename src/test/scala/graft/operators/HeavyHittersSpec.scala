package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** HeavyHitters: the gate (sk_heavy_hitters) proves end-to-end equality
  * with the exact oracle at fixture scale, where the tiny vocabulary
  * never fills a 2000-counter sketch — so the COMPRESS path (the
  * decrement/evict branch that makes the memory bound real) would be
  * dormant without this spec. Here tiny capacities over randomized
  * skewed streams drive eviction constantly, and we assert the two
  * properties the operator's correctness argument rests on:
  *
  *   1. the per-partition summary respects its memory bound
  *      (≤ capacity survivors) and the undercount bound
  *      (est ≤ true ≤ est + n_p/capacity);
  *   2. the end-to-end two-phase result EQUALS the exact
  *      GROUP-BY/HAVING answer whenever capacity > 1/φ — i.e. the
  *      sketch never costs an answer, under every seed and partition
  *      layout tried.
  */
class HeavyHittersSpec extends SparkSpecBase {
  import HeavyHitters.misraGries

  /** Zipf-ish skewed stream over `vocab` items: item i with weight
    * 1/(i+1), the shape where a sketch earns its keep. */
  private def skewedStream(rnd: Random, n: Int, vocab: Int): Seq[String] = {
    val w = Array.tabulate(vocab)(i => 1.0 / (i + 1))
    val cum = w.scanLeft(0.0)(_ + _).tail
    val tot = cum.last
    Seq.fill(n) {
      val x = rnd.nextDouble() * tot
      val i = cum.indexWhere(x <= _)
      s"w${if (i < 0) vocab - 1 else i}"
    }
  }

  test("misraGries: memory bound and undercount bound hold under eviction") {
    for (seed <- 1 to 5; cap <- Seq(2, 4, 8)) {
      val rnd = new Random(seed)
      val stream = skewedStream(rnd, 2000, 50)
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val s = misraGries(stream.iterator, cap)
      assert(s.total == stream.size)
      assert(s.grams.length <= cap, s"cap=$cap seed=$seed kept ${s.grams.length}")
      val err = stream.size.toLong / cap
      s.grams.zip(s.counts).foreach { case (g, est) =>
        val t = exact(g)
        assert(est <= t && t <= est + err,
          s"cap=$cap seed=$seed gram=$g est=$est true=$t err=$err")
      }
      // survival guarantee: anything with count > n/cap is in the summary
      val kept = s.grams.toSet
      exact.foreach { case (g, t) =>
        if (t > err) assert(kept.contains(g), s"cap=$cap seed=$seed lost $g ($t > $err)")
      }
    }
  }

  test("two-phase heavy hitters equals the exact aggregate under constant eviction") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 1 to 3; parts <- Seq(1, 3, 7)) {
      val rnd = new Random(100 + seed)
      // documents of 20 tokens each → bigram stream with Zipf skew
      val docs = Seq.tabulate(120) { i =>
        (i.toLong, skewedStream(rnd, 20, 40).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text").repartition(parts)
      val phi = 0.02
      // capacity 2/phi = 100 >> forced down to the guarantee edge: just
      // above 1/phi, so eviction runs while the superset bound holds
      val got = HeavyHitters.heavyHitters(df, "text", n = 2, phi = phi,
          capacity = (1 / phi).toInt + 7)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val grams = docs.flatMap(_._2.split(" ").sliding(2).map(_.mkString(" ")))
      val thr = math.ceil(phi * grams.size).toLong
      val want = grams.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
        .filter(_._2 >= thr).toSeq.sortBy { case (g, c) => (-c, g) }
      assert(got == want, s"seed=$seed parts=$parts")
    }
  }

  test("short and empty documents contribute no n-grams") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, ""), (2L, "one"), (3L, "a b a b a b")).toDF("doc_id", "text")
    val out = HeavyHitters.heavyHitters(df, "text", n = 2, phi = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 5 bigrams total from doc 3: "a b"×3, "b a"×2; thr = ceil(1.5) = 2
    assert(out == Seq(("a b", 3L), ("b a", 2L)))
  }
}
