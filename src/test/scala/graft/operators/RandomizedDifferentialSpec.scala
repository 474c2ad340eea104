package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Seeded-random differential tests: each scale-safe operator plan must
  * equal its naive (obviously-correct, quadratic) formulation on
  * arbitrary data — fixtures prove the planted cases, these prove the
  * general contract. Seeds are fixed so failures replay. */
class RandomizedDifferentialSpec extends SparkSpecBase {

  import spark.implicits._

  test("asOfJoin.backward equals the naive per-left argmax on random events") {
    val rnd = new scala.util.Random(0xA50F)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(8)).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 400).map(i =>
      (i.toLong + 10000, (rnd.nextInt(8)).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
    val l = left.toDF("lid", "k", "ts")
    val r = right.toDF("rid", "k", "ts", "v")
    val got = AsOfJoin.backward(l, r, "k", "ts", "rid")
      .select(col("lid"), col("asof.rid"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
    val naive = left.map { case (lid, k, ts) =>
      val cands = right.filter(c => c._2 == k && c._3 <= ts)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(c => (c._3, c._1))._1))
    }.toMap
    assert(got === naive)
  }

  test("RangeJoin.pointInInterval equals the naive filter join on random intervals") {
    val rnd = new scala.util.Random(0x4A4E)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(2000).toLong - 500))
    val ivs = (1 to 300).map { i =>
      val s = rnd.nextInt(2000).toLong - 500
      (i.toLong, s, s + rnd.nextInt(100))
    }
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), ivs.toDF("iid", "s", "e"), "p", "s", "e", 37)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = for {
      (pid, p) <- points
      (iid, s, e) <- ivs
      if s <= p && p <= e
    } yield (pid, iid)
    assert(got.sorted.toSeq === naive.sorted)
    assert(got.length === got.toSet.size)
  }

  test("TopKAggregator equals sort-take-k per group on random scores") {
    val rnd = new scala.util.Random(0x70FF)
    val rows = (1 to 2000).map(i =>
      ((rnd.nextInt(20)).toLong, rnd.nextInt(50).toDouble, i.toLong))
    val k = 5
    val agg = new graft.functions.TopKAggregator(k).toColumn.name("top")
    val got = rows.toDS()
      .map { case (g, s, p) => (g, (s, p)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg)
      .collect().map { case (g, top) => g -> top.toList }.toMap
    val naive = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted(Ordering[(Double, Long)].reverse).take(k).toList
    }
    assert(got === naive)
  }

  test("multi-table lshNeighbors equals the naive all-pairs formulation (the one ANN path with no DuckDB oracle)") {
    import graft.functions.VectorFunctions.hyperplanes
    val rnd = new scala.util.Random(0x15AC)
    val dim = 8
    val vecs = (0L until 60L).map(i => i -> Array.fill(dim)(rnd.nextGaussian()))
    val df = vecs.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
    val nBits = 3; val nTables = 3; val k = 2
    val got = SimilaritySearch.lshNeighbors(df, "vec_id", "embedding",
      dim, nBits, k, nTables)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (v, rs) => v -> rs.map(x => (x._2, x._3)).toSet }
    // naive: same plane tables, same bucket rule, exact cosine, top-k by
    // (cos desc, id asc) over the union of candidates across tables
    val tables = (0 until nTables).map(t =>
      hyperplanes(nBits, dim, seed = 0x5CA1AB1EL + t * 0x1000000000000L))
    def bucket(v: Array[Double], planes: Array[Array[Double]]): String =
      planes.map(p => if (v.zip(p).map { case (a, b) => a * b }.sum > 0) '1' else '0').mkString
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val naive = vecs.map { case (i, v) =>
      val cands = vecs.filter { case (j, w) =>
        j != i && tables.exists(t => bucket(v, t) == bucket(w, t))
      }
      i -> cands.map { case (j, w) => (j, cos(v, w)) }
        .sortBy { case (j, c) => (-c, j) }.take(k).toSet
    }.filter(_._2.nonEmpty).toMap
    assert(got.keySet === naive.keySet)
    for (v <- naive.keySet) {
      val g = got(v).map { case (j, c) => (j, math.rint(c * 1e12)) }
      val n = naive(v).map { case (j, c) => (j, math.rint(c * 1e12)) }
      assert(g === n, s"vec $v: got ${got(v)} expected ${naive(v)}")
    }
  }

  test("duplicateClusters equals union-find on a random pair graph") {
    val rnd = new scala.util.Random(0xC1C1)
    val pairs = (1 to 150).map { _ =>
      val a = rnd.nextInt(80).toLong
      var b = rnd.nextInt(80).toLong
      if (a == b) b = (b + 1) % 80
      (math.min(a, b), math.max(a, b))
    }.distinct
    val got = Dedup.duplicateClusters(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val naive = parent.keys.map(x => x -> find(x)).toMap
    assert(got === naive)
  }
}
