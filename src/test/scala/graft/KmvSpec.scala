package graft

import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** KMV sketch contracts: exact below k, estimate-at-k arithmetic, the
  * dedup-by-hash rule, and the monoid property that makes it a SKETCH —
  * sub-corpus sketches merge to exactly the whole-corpus sketch. */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  test("below k the sketch IS the exact distinct count; duplicates " +
    "collapse") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("a", "z"),
      ("b", "x")).toDF("g", "e")
    val out = Kmv.kmvDistinct(df, "g", "e", k = 8)
      .as[(String, Long, Double)].collect().toMap2
    assert(out("a") == ((3L, 3.0)))
    assert(out("b") == ((1L, 1.0)))
  }

  private implicit class Tup3Map(rs: Array[(String, Long, Double)]) {
    def toMap2: Map[String, (Long, Double)] =
      rs.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("at k the estimate is (k-1)/u_k and lands near the truth on a " +
    "1000-element group") {
    val df = (1 to 1000).map(i => ("g", s"elem$i")).toDF("g", "e")
    val (nMins, est) = Kmv.kmvDistinct(df, "g", "e", k = 64)
      .as[(String, Long, Double)].collect().toMap2.apply("g")
    assert(nMins == 64L)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 13%; allow 3σ
    assert(est > 600 && est < 1700, s"estimate $est wildly off 1000")
    // and the estimate is the closed-form function of the 64th hash
    val h64 = df.select(md5($"e").as("h")).distinct()
      .orderBy($"h").limit(64).collect().map(_.getString(0)).max
    val u = java.lang.Long.parseLong(h64.take(8), 16).toDouble / 4294967296.0
    assert(est == 63.0 / u)
  }

  test("KmvAgg property: any insertion order and any merge split yields " +
    "the sorted distinct bottom-k — the algebraic contract udaf relies on") {
    val rnd = new scala.util.Random(7)
    val agg = new Kmv.KmvAgg(16)
    (1 to 200).foreach { round =>
      val vals = Vector.fill(60)(f"${rnd.nextInt(500)}%032x")
      val expected = vals.distinct.sorted.take(16)
      val cut = rnd.nextInt(vals.size + 1)
      val (l, r) = vals.splitAt(cut)
      val sl = l.foldLeft(agg.zero)(agg.reduce)
      val sr = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(sl, sr)) == expected, s"round $round split")
      assert(agg.finish(rnd.shuffle(vals).foldLeft(agg.zero)(agg.reduce))
        == expected, s"round $round order")
    }
  }

  test("monoid: merging per-slice sketches equals the whole-corpus " +
    "sketch — the rollup property") {
    val all = (1 to 500).map(i => ("g", s"e${i % 320}")).toDF("g", "e")
    val k = 32
    def mins(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(md5($"e").as("h")).distinct()
        .orderBy($"h").limit(k).as[String].collect().toSeq
    // the aggregator merges partition-local states; repartitioning
    // changes the merge tree, never the sketch
    val a = Kmv.kmvDistinct(all.repartition(1), "g", "e", k)
      .as[(String, Long, Double)].head()
    val b = Kmv.kmvDistinct(all.repartition(7), "g", "e", k)
      .as[(String, Long, Double)].head()
    assert(a == b, "sketch depends on the merge tree")
    // and equals the ground-truth bottom-k estimate
    val h = mins(all).max
    val u = java.lang.Long.parseLong(h.take(8), 16).toDouble / 4294967296.0
    assert(a._3 == (k - 1).toDouble / u)
  }
}
