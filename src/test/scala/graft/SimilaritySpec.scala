package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Vector-similarity suite: the native dot-product kernel (interpreted and
  * codegen paths, null semantics), cosine, exact top-k, bucketed ANN, and
  * blocked near-dup pairs vs a brute-force reference. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def dotOf(a: Seq[Float], b: Seq[Float]): java.lang.Double = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("d")).collect().head
    if (r.isNullAt(0)) null else r.getDouble(0)
  }

  test("dot: exact value, strict left-to-right double accumulation") {
    assert(dotOf(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) == 32.0)
    assert(dotOf(Seq.empty, Seq.empty) == 0.0)
    // accumulates in double: 0.1f products don't collapse to float rounding
    val v = Seq.fill(10)(0.1f)
    val expect = v.map(x => x.toDouble * x.toDouble).sum
    assert(math.abs(dotOf(v, v) - expect) < 1e-18)
  }

  test("dot: null semantics — null array, length mismatch, null element") {
    assert(dotOf(null, Seq(1f)) == null)
    assert(dotOf(Seq(1f, 2f), Seq(1f)) == null)
    val withNullElem = Seq((Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f)))
      .toDF("a", "b").select(Similarity.dot($"a", $"b")).collect().head
    assert(withNullElem.isNullAt(0))
  }

  test("dot: interpreted eval agrees with codegen") {
    val df = (1 to 50).map { i =>
      (i.toLong, (0 until 8).map(j => (i * 31 + j * 7 % 13).toFloat / 10f))
    }.toDF("id", "v")
    val q = (0 until 8).map(j => (j + 1).toFloat / 10f)
    val codegen = df.select($"id", Similarity.dot($"v", lit(q.toArray)).as("d"))
      .orderBy("id").as[(Long, Double)].collect()
    val interp = df.select($"id",
      aggregate(zip_with($"v", lit(q.toArray), (x, y) =>
        x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x).as("d"))
      .orderBy("id").as[(Long, Double)].collect()
    assert(codegen.toSeq == interp.toSeq)
  }

  test("cosine: identical vectors -> 1, orthogonal -> 0, zero vector -> 0") {
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      Seq((a, b)).toDF("a", "b")
        .select(Similarity.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(cos(Seq(1f, 2f), Seq(1f, 2f)) - 1.0) < 1e-12)
    assert(cos(Seq(1f, 0f), Seq(0f, 1f)) == 0.0)
    assert(cos(Seq(0f, 0f), Seq(1f, 1f)) == 0.0) // zero-norm guard
  }

  test("bruteForceTopK: exact ranking with deterministic tie-break") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)),    // cos = 1 with query
      (2L, Seq(2f, 0f)),    // cos = 1 (tie -> id order)
      (3L, Seq(1f, 1f)),    // cos ~ 0.707
      (4L, Seq(0f, 1f)),    // cos = 0
      (5L, Seq(-1f, 0f)))   // cos = -1
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus, Seq(1f, 0f), k = 3)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(top == Seq(1L, 2L, 3L))
  }

  test("annTopK: hamming<=1 multi-probe covers adjacent buckets") {
    // positions 1 and 2 (1-indexed) -> 2-bit bucket; query bucket = 3
    val corpus = Seq(
      (1L, Seq(1f, 1f)),     // bucket 3 (exact), cos=1 with query
      (2L, Seq(0.5f, 0.6f)), // bucket 3
      (3L, Seq(-1f, 1f)),    // bucket 2 — one bit away, probed
      (4L, Seq(1f, -1f)),    // bucket 1 — one bit away, probed
      (5L, Seq(-1f, -1f)))   // bucket 0 — two bits away, never scanned
      .toDF("vec_id", "embedding")
    val res = Similarity.annTopK(corpus, Seq(1f, 1f), k = 10,
      positions = Seq(1, 2)).as[(Long, Double)].collect().map(_._1).toSet
    assert(res == Set(1L, 2L, 3L, 4L))
  }

  test("annTopK: probeDist=0 restricts to the exact sign bucket") {
    val corpus = Seq(
      (1L, Seq(1f, 1f)),     // bucket 3
      (2L, Seq(0.5f, 0.6f)), // bucket 3
      (3L, Seq(-1f, 1f)),    // bucket 2 — not probed at dist 0
      (4L, Seq(1f, -1f)))    // bucket 1 — not probed at dist 0
      .toDF("vec_id", "embedding")
    val res = Similarity.annTopK(corpus, Seq(1f, 1f), k = 10,
      positions = Seq(1, 2), probeDist = 0)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(res == Set(1L, 2L))
  }

  test("annRecallAtK: perfect recall when neighbors share probed " +
    "buckets; a hamming-2 true neighbor is a visible miss; every " +
    "query emits a row") {
    // 2-bit buckets over positions (1, 2). Query A = (1,1), bucket 3:
    // true top-2 {1, 5}, both in bucket 3 — reachable at any probe
    // distance. Query B = (-1,1), bucket 2: true top-2 is {3 (cos 1),
    // 1 (cos 0, beats the id-tied 5)} — id 1 sits one bit away, so
    // hamming<=1 reaches it but probeDist 0 (bucket 2 = {3} alone)
    // cannot: B's recall drops to 1/2 and must be VISIBLE, not absent.
    val corpus = Seq(
      (1L, Seq(1f, 1f)),       // bucket 3
      (3L, Seq(-1f, 1f)),      // bucket 2
      (4L, Seq(1f, -1f)),      // bucket 1
      (5L, Seq(0.9f, 0.9f)))   // bucket 3
      .toDF("vec_id", "embedding")
    val qs = Seq((100L, Seq(1f, 1f)), (200L, Seq(-1f, 1f)))
      .toDF("qid", "qvec")
    val full = Similarity.annRecallAtK(corpus, qs, k = 2,
      positions = Seq(1, 2), probeDist = 1)
      .orderBy($"qid").as[(Long, Long, Double)].collect().toSeq
    assert(full == Seq((100L, 2L, 1.0), (200L, 2L, 1.0)))
    val exact = Similarity.annRecallAtK(corpus, qs, k = 2,
      positions = Seq(1, 2), probeDist = 0)
      .orderBy($"qid").as[(Long, Long, Double)].collect().toSeq
    assert(exact == Seq((100L, 2L, 1.0), (200L, 1L, 0.5)))
  }

  test("l2sq kernel: exact squared distance, null on mismatch") {
    val d = Seq((Seq(1f, 2f), Seq(4f, 6f))).toDF("a", "b")
      .select(Similarity.l2sq($"a", $"b")).as[Double].head()
    assert(d == 25.0) // 3² + 4²
    val bad = Seq((Seq(1f), Seq(1f, 2f))).toDF("a", "b")
      .select(Similarity.l2sq($"a", $"b")).collect().head
    assert(bad.isNullAt(0))
  }

  test("knnSelfJoin: equals brute-force top-k over hamming<=1 candidates; " +
    "top-k plans as WindowGroupLimit") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val knn = Similarity.knnSelfJoin(corpus, k = 3)
    val fast = knn.orderBy("vec_id", "nbr_rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // brute force: all pairs, hamming<=1 bucket filter, window top-3
    val bk = Similarity.signBucket($"embedding", Similarity.defaultPositions)
    val v = corpus.select($"vec_id", $"embedding", bk.as("bk"))
    val cand = v.as("a").join(v.as("b"),
      $"a.vec_id" =!= $"b.vec_id")
      .filter(bit_count($"a.bk".bitwiseXOR($"b.bk")) <= 1)
      .select($"a.vec_id".as("vec_id"), $"b.vec_id".as("nbr_id"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"score".desc, $"nbr_id")
    val brute = cand
      .withColumn("nbr_rank", row_number().over(w).cast("long"))
      .filter($"nbr_rank" <= 3).orderBy("vec_id", "nbr_rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(fast.nonEmpty && fast == brute)
    // map-side truncation to k before the shuffle
    val p = knn.queryExecution.executedPlan.toString
    assert(p.contains("row_number(), 3, Partial"), p)
    assert(p.contains("row_number(), 3, Final"), p)
  }

  test("ivfAssign: nearest centroid, ties to lower cid") {
    val cents = Seq(Seq(0f, 0f), Seq(10f, 0f), Seq(0f, 10f))
    val cells = Seq(
      (1L, Seq(1f, 1f)),    // nearest origin -> 0
      (2L, Seq(9f, 1f)),    // -> 1
      (3L, Seq(1f, 9f)),    // -> 2
      (4L, Seq(5f, 0f)))    // equidistant 0 and 1 -> tie to 0
      .toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.ivfAssign($"embedding", cents).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(cells == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("kmeansStep: per-cell fixed-point means, one row per (cell, dim)") {
    val cents = Seq(Seq(0f, 0f), Seq(10f, 10f))
    val corpus = Seq(
      (1L, Seq(1f, 2f)),   // cell 0
      (2L, Seq(3f, 0f)),   // cell 0
      (3L, Seq(9f, 9f)))   // cell 1
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(corpus, cents)
      .orderBy("cell", "dim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 2.0), (0L, 1L, 2L, 1.0),
      (1L, 0L, 1L, 9.0), (1L, 1L, 1L, 9.0)))
  }

  test("quantizeInt8: symmetric absmax, half-up rounding, range bound, " +
    "dequantization error within m/254, zero vector -> zeros") {
    val corpus = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0f, 0f, 0f)),
      (3L, Seq(3f)))
      .toDF("vec_id", "embedding")
    val qDf = Similarity.quantizeInt8(corpus)
    // the storage cut is real only if components are 1-byte on disk
    assert(qDf.schema("q").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true),
      s"q must be array<tinyint>, got ${qDf.schema("q").dataType}")
    val q = qDf
      .select($"vec_id", $"q_scale", $"q")
      .as[(Long, Double, Seq[Byte])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // 0.5·127=63.5 -> 64 (half-up); -1·127=-127; 0.25·127=31.75 -> 32
    assert(q(1L) == ((1.0, Seq[Byte](64, -127, 32))))
    assert(q(2L) == ((0.0, Seq[Byte](0, 0, 0))))
    assert(q(3L) == ((3.0, Seq[Byte](127))))

    val v = Seq(0.113f, -0.87f, 0.52f, 0.004f)
    val out = Similarity.quantizeInt8(Seq((9L, v)).toDF("vec_id", "embedding"))
    val (m, qs) = out.select($"q_scale", $"q").as[(Double, Seq[Byte])].head()
    v.zip(qs).foreach { case (x, qi) =>
      assert(qi >= -127 && qi <= 127)
      assert(math.abs(x - qi * m / 127.0) <= m / 254.0 + 1e-9,
        s"component $x dequantized too far: $qi scale $m")
    }
    // a storage transform must stay a narrow projection: no exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quantization should not shuffle:\n$plan")
  }

  test("int8TopK: exact integer scoring over quantized vectors, " +
    "zero vectors score 0, identical vectors score exactly 1.0") {
    val vecs = Seq(
      (0L, Seq(0.5f, -1.0f, 0.25f)),
      (1L, Seq(0.5f, -1.0f, 0.25f)), // identical -> quantized cosine 1.0
      (2L, Seq(-0.5f, 1.0f, -0.25f)), // opposite -> -1.0
      (3L, Seq(0f, 0f, 0f)), // zero vector -> 0.0
      (4L, Seq(1f, 1f, 1f)))
    val q = Seq(0.5f, -1.0f, 0.25f)
    val got = Similarity.int8TopK(vecs.toDF("vec_id", "embedding"), q, k = 5)
      .as[(Long, Double)].collect().toSeq
    // driver-side recomputation with the same integer arithmetic
    def quant(v: Seq[Float]): Seq[Long] = {
      val m = v.map(x => math.abs(x.toDouble)).max
      if (m > 0) v.map(x => math.floor(x.toDouble * 127.0 / m + 0.5).toLong)
      else v.map(_ => 0L)
    }
    val qq = quant(q)
    val nq2 = qq.map(x => x * x).sum
    val expected = vecs.map { case (id, v) =>
      val qv = quant(v)
      val di = qv.zip(qq).map { case (a, b) => a * b }.sum
      val na2 = qv.map(x => x * x).sum
      (id, if (na2 > 0 && nq2 > 0) di / math.sqrt((na2 * nq2).toDouble)
      else 0.0)
    }.sortBy { case (id, s) => (-s, id) }
    assert(got == expected)
    // identical quantized vectors: di = na2 = nq2, so the score is
    // EXACTLY 1.0 (integer arithmetic, one exact sqrt) — not 1-ulp off
    assert(got.find(_._1 == 1L).get._2 == 1.0)
    assert(got.find(_._1 == 3L).get._2 == 0.0)
    // NB the opposite vector is NOT exactly -1: half-up rounding isn't
    // symmetric around zero (-63.5 -> -63 where 63.5 -> 64), so
    // q(-v) != -q(v) on exact halves — covered by the expected-equality
    // above, pinned here as documentation
    assert(got.find(_._1 == 2L).get._2 < -0.999)
  }

  test("kmeansTrain: converges to a fixed point, retains empty cells, " +
    "maxIters=0 returns the seed codebook") {
    // seeds (first 3 ids): two identical vectors + one distinct — cell 1
    // goes empty immediately (ties assign to the LOWER cid) and must
    // keep its centroid through every round
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f)),
      (4L, Seq(1f, 0f)), (5L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val seed = Similarity.kmeansTrain(corpus, k = 3, maxIters = 0)
    assert(seed == Seq(Seq(1f, 0f), Seq(1f, 0f), Seq(0f, 1f)))
    val trained = Similarity.kmeansTrain(corpus, k = 3, maxIters = 10)
    // cells are already the means: exact fixed point after round 1, the
    // tol=0 stop fires instead of burning 10 rounds
    assert(trained == Seq(Seq(1f, 0f), Seq(1f, 0f), Seq(0f, 1f)))
  }

  test("kmeansTrain: trained codebook lifts IVF recall over the id-order " +
    "seed codebook") {
    // Three true clusters; the id-order seed puts ALL THREE centroids
    // inside cluster A, splitting A across cells — a query whose true
    // neighbors straddle the split loses them at nprobe=1. Training
    // migrates one centroid to B (iter 1 pulls the B/C-polluted cells
    // outward, iter 2 separates cleanly), restoring recall.
    val a = Seq(
      (1L, Seq(1f, -0.3f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, 0.3f)),
      (4L, Seq(1f, -0.25f)), (5L, Seq(1f, -0.2f)), (6L, Seq(1f, -0.1f)),
      (7L, Seq(1f, 0.1f)), (8L, Seq(1f, 0.2f)), (9L, Seq(1f, 0.25f)))
    val b = (11L to 15L).map(i => (i, Seq(-1f, 5f + (i - 11) * 0.01f)))
    val c = (21L to 25L).map(i => (i, Seq(-1f, -5f - (i - 21) * 0.01f)))
    val corpus = (a ++ b ++ c).toDF("vec_id", "embedding")
    val q = Seq(1f, -0.12f)

    val truth = Similarity.bruteForceTopK(corpus, q, k = 3)
      .select($"vec_id").as[Long].collect().toSet
    def recall(centroids: Seq[Seq[Float]]): Double = {
      val got = Similarity.ivfTopK(corpus, centroids, q, k = 3, nprobe = 1)
        .select($"vec_id").as[Long].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val untrained = recall(Similarity.ivfCentroids(corpus, k = 3))
    val trained = recall(Similarity.kmeansTrain(corpus, k = 3, maxIters = 10))
    assert(trained > untrained,
      s"trained recall $trained should beat untrained $untrained")
    assert(trained == 1.0, s"trained recall $trained")
    // and the trained codebook's cells separate the true clusters: all
    // of A now shares one cell
    val cells = corpus.select($"vec_id",
      Similarity.ivfAssign($"embedding",
        Similarity.kmeansTrain(corpus, k = 3, maxIters = 10)).as("cell"))
      .as[(Long, Int)].collect().toMap
    assert(a.map(v => cells(v._1)).toSet.size == 1)
    assert(Set(a.head._1, b.head._1, c.head._1).map(cells).size == 3)
  }

  test("ivfTopK: equals brute force restricted to the probed cells") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.ivfCentroids(corpus, k = 8)
    val q = corpus.filter($"vec_id" === 0)
      .select($"embedding").first().getSeq[Float](0)

    val ivf = Similarity.ivfTopK(corpus, cents, q, k = 10, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    // reference: same probe set computed independently, brute force within
    val probed = cents.zipWithIndex.map { case (c, i) =>
      (c.zip(q).foldLeft(0.0) { case (a, (x, y)) =>
        val d = x.toDouble - y.toDouble; a + d * d
      }, i)
    }.sorted.take(3).map(_._2).toSet
    val brute = corpus
      .withColumn("cell", Similarity.ivfAssign($"embedding", cents))
      .filter($"cell".isin(probed.toSeq: _*))
      .select($"vec_id", Similarity.cosine($"embedding", lit(q.toArray)).as("score"))
      .orderBy($"score".desc, $"vec_id").limit(10)
      .as[(Long, Double)].collect().toSeq
    assert(ivf == brute)
    assert(ivf.nonEmpty)
    // nprobe = all cells degenerates to exact brute-force top-k
    val full = Similarity.ivfTopK(corpus, cents, q, k = 5, nprobe = 8)
      .as[(Long, Double)].collect().toSeq
    val exact = Similarity.bruteForceTopK(corpus, q, k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(full == exact)
  }

  test("codebook persistence: parquet round-trip is bit-exact, searches identical") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-codebooks")

    // flat (kmeans) codebook: save → load must be structurally equal
    val flat = Similarity.kmeansTrain(corpus, k = 8, maxIters = 2)
    val flatPath = dir.resolve("flat").toString
    Similarity.saveCodebook(spark, flat, flatPath)
    assert(Similarity.loadCodebook(spark, flatPath) == flat,
      "flat codebook changed across the parquet round-trip")

    // and the reloaded codebook reproduces the search bit-for-bit
    val q = corpus.filter($"vec_id" === 0)
      .select($"embedding").first().getSeq[Float](0)
    val direct = Similarity.ivfTopK(corpus, flat, q, k = 10, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    val reloaded = Similarity.ivfTopK(corpus,
      Similarity.loadCodebook(spark, flatPath), q, k = 10, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    assert(direct == reloaded)

    // PQ (multi-book) codebooks round-trip through the same artifact shape
    val pq = Similarity.pqTrain(corpus, d = 64, m = 4, k = 4, maxIters = 2)
    val pqPath = dir.resolve("pq").toString
    Similarity.saveCodebooks(spark, pq, pqPath)
    assert(Similarity.loadCodebooks(spark, pqPath) == pq,
      "PQ codebooks changed across the parquet round-trip")

    // a flat load of a multi-book artifact must refuse, not mis-merge
    intercept[IllegalArgumentException] {
      Similarity.loadCodebook(spark, pqPath)
    }
    // empty codebooks are refused at save time
    intercept[IllegalArgumentException] {
      Similarity.saveCodebooks(spark, Seq.empty, dir.resolve("x").toString)
    }
  }

  test("cosineNearDupPairsLsh: equals brute force restricted to hamming<=1 buckets") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val lsh = Similarity.cosineNearDupPairsLsh(corpus, threshold = 0.3)
      .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq

    val prep = corpus.select($"vec_id", $"embedding",
      Similarity.signBucket($"embedding", Similarity.defaultPositions).as("bk"))
    val brute = prep.as("a").crossJoin(prep.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .filter(bit_count($"a.bk".bitwiseXOR($"b.bk")) <= 1)
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("score"))
      .filter($"score" >= 0.3)
      .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
    assert(lsh == brute)
    assert(lsh.nonEmpty, "sf0.001 should contain at least one LSH near-dup pair")

    // exact-bucket (probe1 = false) is the hamming-0 subset
    val exact = Similarity.cosineNearDupPairsLsh(corpus, threshold = 0.3,
      probe1 = false)
      .as[(Long, Long, Double)].collect().toSeq
    assert(exact.toSet.subsetOf(lsh.toSet))
  }

  test("cosineNearDupPairs: matches per-pair cosine, blocked, a < b") {
    val df = Seq(
      (1L, "x", Seq(1f, 0f, 0f)),
      (2L, "x", Seq(0.9f, 0.1f, 0f)),
      (3L, "x", Seq(0f, 0f, 1f)),
      (4L, "y", Seq(1f, 0f, 0f)))   // same direction as 1, other block
      .toDF("vec_id", "label", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    val direct = Seq((Seq(1f, 0f, 0f), Seq(0.9f, 0.1f, 0f)))
      .toDF("a", "b").select(Similarity.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(pairs.head._3 - direct) < 1e-12)
  }

  test("pqTrain/pqAssign: independent subspace codebooks recover planted " +
    "cluster structure; codes are narrow plan literals") {
    // 4-dim vectors, m=2 subspaces of 2 dims; subspace 0 clusters ids
    // {0,2} vs {1,3} near (0,0) vs (10,10); subspace 1 the OPPOSITE
    // pairing {1,2} vs {0,3} — codes must disagree across subspaces,
    // proving independence. The id-order seeds (ids 0, 1) straddle
    // both splits, so Lloyd's converges to the planted clusters.
    val vecs = Seq(
      (0L, Seq(0.0f, 0.1f, 9.9f, 10.0f)),
      (1L, Seq(10.0f, 9.9f, 0.1f, 0.0f)),
      (2L, Seq(0.1f, 0.0f, 0.0f, 0.1f)),
      (3L, Seq(9.9f, 10.0f, 10.0f, 9.9f)))
      .toDF("vec_id", "embedding")
    val cbs = Similarity.pqTrain(vecs, d = 4, m = 2, k = 2, maxIters = 3)
    assert(cbs.length == 2 && cbs.forall(_.length == 2))
    val codes = vecs.select($"vec_id",
        Similarity.pqAssign($"embedding", cbs).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    // within each subspace, the planted pairs share a code and the
    // cross pairs differ
    assert(codes(0L)(0) == codes(2L)(0) && codes(1L)(0) == codes(3L)(0))
    assert(codes(0L)(0) != codes(1L)(0))
    assert(codes(1L)(1) == codes(2L)(1) && codes(0L)(1) == codes(3L)(1))
    assert(codes(1L)(1) != codes(0L)(1))
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(vecs, d = 4, m = 3, k = 2, maxIters = 1)
    }
  }

  test("pqAdcTopK: code-only scores rank the query's own cluster first " +
    "and equal the hand LUT sums") {
    val vecs = Seq(
      (0L, Seq(0.0f, 0.1f, 9.9f, 10.0f)),
      (1L, Seq(10.0f, 9.9f, 0.1f, 0.0f)),
      (2L, Seq(0.1f, 0.0f, 0.0f, 0.1f)),
      (3L, Seq(9.9f, 10.0f, 10.0f, 9.9f)))
      .toDF("vec_id", "embedding")
    val cbs = Similarity.pqTrain(vecs, d = 4, m = 2, k = 2, maxIters = 3)
    val codes = vecs.select($"vec_id",
      Similarity.pqAssign($"embedding", cbs).as("codes"))
    val q = Seq(0.0f, 0.1f, 9.9f, 10.0f) // vec 0 itself
    val got = Similarity.pqAdcTopK(codes, cbs, q, k = 4)
      .as[(Long, Double)].collect().toSeq
    assert(got.head._1 == 0L) // its own cell pair wins
    // hand recomputation: distance of each vector's codewords to q
    val codeMap = codes.as[(Long, Seq[Long])].collect().toMap
    def lut(j: Int, code: Long): Double = {
      val qs = q.slice(j * 2, j * 2 + 2)
      cbs(j)(code.toInt).zip(qs).foldLeft(0.0) { case (a, (x, qq)) =>
        val d = x.toDouble - qq.toDouble; a + d * d
      }
    }
    val want = codeMap.map { case (id, cs) =>
      id -> (lut(0, cs(0)) + lut(1, cs(1)))
    }
    got.foreach { case (id, s) => assert(s == want(id), s"id $id") }
    assert(got.map(_._2) == got.map(_._2).sorted)
  }

  test("residual IVF-PQ beats raw IVF-PQ recall on a clustered corpus — " +
    "the claimed recall edge, measured") {
    // 4 planted clusters at orthogonal centers (scale 100), 30 points
    // each with deterministic offsets in [-1, 1]: between-cluster
    // variance dwarfs within-cluster detail, so RAW PQ codewords (k=4
    // per subspace) burn on cluster centers and collapse every
    // same-cluster vector to one code — ADC then cannot rank within
    // the probed cluster. RESIDUAL codes quantize offsets only (the
    // coarse quantizer has absorbed the centers), which is precisely
    // where the FAISS by_residual recall edge comes from.
    val dim = 8
    val nPerC = 30
    // ids INTERLEAVE clusters (cluster = id % 4) so the id-order seeds
    // of both the coarse and the PQ training span all four clusters —
    // seeds drawn from one cluster would leave Lloyd's in a degenerate
    // fixed point where the residual store is a pure translation of the
    // raw one and the comparison measures nothing
    val rows = for (c <- 0 until 4; i <- 0 until nPerC) yield {
      val id = (i * 4 + c).toLong
      val v = (0 until dim).map { d =>
        val center = if (d == 2 * c) 100f else if (d == 2 * c + 1) -100f else 0f
        center + ((id * 31 + d * 17) % 21 - 10).toFloat / 10f
      }
      (id, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(corpus, k = 4, maxIters = 3)
    val cbsRaw = Similarity.pqTrain(corpus, d = dim, m = 2, k = 4, maxIters = 2)
    val cbsRes = Similarity.pqTrainResidual(corpus, cents,
      d = dim, m = 2, k = 4, maxIters = 2)
    val root = java.nio.file.Files.createTempDirectory("ivfpq_recall").toString
    Similarity.writeIvfPqPartitioned(corpus, cents, cbsRaw, s"$root/raw")
    Similarity.writeIvfPqResidualPartitioned(corpus, cents, cbsRes, s"$root/res")
    val k = 10
    val byId = rows.toMap
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        val d = x.toDouble - y.toDouble; acc + d * d
      }
    def recall(qid: Long, cand: org.apache.spark.sql.DataFrame): Double = {
      val brute = rows.map { case (id, v) => (l2(v, byId(qid)), id) }
        .sorted.take(k).map(_._2).toSet
      val got = cand.select($"vec_id").as[Long].collect().toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val qids = Seq(0L, 33L, 66L, 103L) // one query per cluster (id % 4)
    val rRaw = qids.map(q => recall(q,
      Similarity.ivfPqTopK(spark, s"$root/raw", cents, cbsRaw,
        byId(q), k = k, nprobe = 1)))
    val rRes = qids.map(q => recall(q,
      Similarity.ivfPqResidualTopK(spark, s"$root/res", cents, cbsRes,
        byId(q), k = k, nprobe = 1)))
    val (mRaw, mRes) = (rRaw.sum / rRaw.size, rRes.sum / rRes.size)
    assert(mRes > mRaw,
      s"residual recall $mRes must beat raw $mRaw on the clustered corpus " +
        s"(raw per-query: $rRaw, residual per-query: $rRes)")
    // 0.7 floor: m=2 subspaces × k=4 codewords is a deliberately tiny
    // code budget (the regime where the variants separate); the margin
    // over raw, not the absolute number, is the claim under test
    assert(mRes >= 0.7,
      s"residual recall $mRes should be high once codes describe offsets")
  }

  test("ivfPqTopKBatch equals the per-query loop bit-for-bit — both " +
    "composites, one job instead of a driver loop") {
    val dim = 8
    val rows = (0 until 60).map { i =>
      val id = i.toLong
      val v = (0 until dim).map { d =>
        (if (d == (i % 4) * 2) 50f else 0f) +
          ((id * 31 + d * 17) % 21 - 10).toFloat / 10f
      }
      (id, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(corpus, k = 4, maxIters = 2)
    val cbsRaw = Similarity.pqTrain(corpus, d = dim, m = 2, k = 4, maxIters = 2)
    val cbsRes = Similarity.pqTrainResidual(corpus, cents,
      d = dim, m = 2, k = 4, maxIters = 2)
    val root = java.nio.file.Files.createTempDirectory("ivfpq_batch").toString
    Similarity.writeIvfPqPartitioned(corpus, cents, cbsRaw, s"$root/raw")
    Similarity.writeIvfPqResidualPartitioned(corpus, cents, cbsRes, s"$root/res")
    val byId = rows.toMap
    val qids = Seq(0L, 5L, 10L, 33L)
    val queries = qids.map(q => (q, byId(q))).toDF("qid", "qvec")
    val k = 5; val np = 2
    def loop(res: Boolean): Set[(Long, Long, Double)] =
      qids.flatMap { q =>
        val df =
          if (res) Similarity.ivfPqResidualTopK(spark, s"$root/res", cents,
            cbsRes, byId(q), k = k, nprobe = np)
          else Similarity.ivfPqTopK(spark, s"$root/raw", cents,
            cbsRaw, byId(q), k = k, nprobe = np)
        df.select($"vec_id", $"adist").as[(Long, Double)].collect()
          .map { case (id, d) => (q, id, d) }
      }.toSet
    def batch(res: Boolean): Set[(Long, Long, Double)] =
      Similarity.ivfPqTopKBatch(spark,
        if (res) s"$root/res" else s"$root/raw", cents,
        if (res) cbsRes else cbsRaw, queries,
        k = k, nprobe = np, byResidual = res)
        .as[(Long, Long, Double)].collect().toSet
    // tuple equality includes the DOUBLE scores: same probe sets, same
    // LUT arithmetic, same fixed-order score trees, same tie order
    assert(batch(res = false) == loop(res = false),
      "raw-codes batch probe diverged from the per-query loop")
    assert(batch(res = true) == loop(res = true),
      "residual batch probe diverged from the per-query loop")
    // plan shape: the probe frame BROADCASTS into the store join (the
    // store side must never shuffle for it), and the only cartesian is
    // the intended tiny queries × centroid-table probe assignment
    val p = Similarity.ivfPqTopKBatch(spark, s"$root/raw", cents,
      cbsRaw, queries, k = k, nprobe = np)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"store join must broadcast the probe frame:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"store side must not shuffle for the probe join:\n$p")
  }

  test("ivfPqTopKFiltered: pre-filter semantics — full k from the " +
    "allowed slice, equal to ADC over probed∩allowed") {
    val dim = 8
    val rows = (0 until 80).map { i =>
      val id = i.toLong
      val v = (0 until dim).map { d =>
        (if (d == (i % 4) * 2) 50f else 0f) +
          ((id * 31 + d * 17) % 21 - 10).toFloat / 10f
      }
      (id, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrain(corpus, k = 4, maxIters = 2)
    val cbs = Similarity.pqTrain(corpus, d = dim, m = 2, k = 4, maxIters = 2)
    val root = java.nio.file.Files.createTempDirectory("ivfpq_filt").toString
    Similarity.writeIvfPqPartitioned(corpus, cents, cbs, s"$root/st")
    val q = rows.toMap.apply(0L)
    val allowed = corpus.filter($"vec_id" % 3 === 0).select($"vec_id")
    val got = Similarity.ivfPqTopKFiltered(spark, s"$root/st", cents, cbs,
      q, allowed, k = 5, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got.size == 5, "pre-filter must fill k from the allowed slice")
    assert(got.forall(_._1 % 3 == 0), "every survivor satisfies the filter")
    // equality with ADC over the manually intersected scan
    val probed = Similarity.probeCells(cents, q, 2)
    val want = Similarity.pqAdcTopK(
      spark.read.parquet(s"$root/st")
        .filter($"ivf_cell".isin(probed: _*) && $"vec_id" % 3 === 0),
      cbs, q, k = 5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("incremental IVF-PQ via snapshot append equals a one-shot " +
    "rebuild; the initial version still answers alone") {
    val dim = 8
    val rows = (0 until 80).map { i =>
      val id = i.toLong
      val v = (0 until dim).map { d =>
        (if (d == (i % 4) * 2) 50f else 0f) +
          ((id * 29 + d * 13) % 19 - 9).toFloat / 9f
      }
      (id, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val a = corpus.filter($"vec_id" % 2 === 0)
    val b = corpus.filter($"vec_id" % 2 =!= 0)
    // frozen codebooks: trained on the initial batch only
    val cents = Similarity.kmeansTrain(a, k = 4, maxIters = 2)
    val cbs = Similarity.pqTrain(a, d = dim, m = 2, k = 4, maxIters = 2)
    def codes(df: org.apache.spark.sql.DataFrame) = df.select($"vec_id",
      Similarity.pqAssign($"embedding", cbs).as("codes"),
      Similarity.ivfAssign($"embedding", cents).as("ivf_cell"))
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_incr").toString
    val tbl = s"$tmp/snap"
    graft.operators.Snapshots.init(spark, tbl)
    val v0 = graft.operators.Snapshots.commitPartitioned(spark, codes(a),
      tbl, "ivf_cell", append = false)
    val v1 = graft.operators.Snapshots.commitPartitioned(spark, codes(b),
      tbl, "ivf_cell", append = true)
    // one-shot rebuild with the same frozen codebooks
    Similarity.writeIvfPqPartitioned(corpus, cents, cbs, s"$tmp/full")
    val q = rows.toMap.apply(1L)
    val probed = Similarity.probeCells(cents, q, 2)
    def adcOver(scan: org.apache.spark.sql.DataFrame) =
      Similarity.pqAdcTopK(scan, cbs, q, k = 6)
        .as[(Long, Double)].collect().toSeq
    val gotIncr = adcOver(probed
      .map(c => graft.operators.Snapshots
        .scanPartitionAsOf(spark, tbl, v1, "ivf_cell", c))
      .reduce(_ unionByName _))
    val wantFull = adcOver(spark.read.parquet(s"$tmp/full")
      .filter($"ivf_cell".isin(probed: _*)))
    assert(gotIncr == wantFull,
      "append vs rebuild must be invisible to the ranking")
    // time travel: v0's probe sees only the initial batch
    val gotV0 = adcOver(probed
      .map(c => graft.operators.Snapshots
        .scanPartitionAsOf(spark, tbl, v0, "ivf_cell", c))
      .reduce(_ unionByName _))
    assert(gotV0.forall(_._1 % 2 == 0),
      "version 0 must rank only the initial batch's vectors")
  }

  test("centroidDrift: exact per-dim mean gaps; one-slice labels drop") {
    val base = Seq(
      (1L, 0, Seq(1.0f, 2.0f)), (2L, 0, Seq(3.0f, 2.0f)), // label 0: mean (2, 2)
      (3L, 1, Seq(0.5f, 0.5f)), // label 1: only in base — must drop
      (4L, 2, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val delta = Seq(
      (5L, 0, Seq(4.0f, 2.0f)), // label 0 drifts +2 on dim 0 only
      (6L, 2, Seq(1.0f, 1.0f))) // label 2: no drift
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidDrift(base, delta)
      .orderBy($"label", $"dim")
      .select($"label", $"dim", $"n_base", $"n_delta",
        $"mean_base", $"mean_delta", $"gap")
      .as[(Int, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0, 0L, 2L, 1L, 2.0, 4.0, 2.0),
      (0, 1L, 2L, 1L, 2.0, 2.0, 0.0),
      (2, 0L, 1L, 1L, 1.0, 1.0, 0.0),
      (2, 1L, 1L, 1L, 1.0, 1.0, 0.0)))
  }
}
