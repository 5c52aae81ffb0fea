package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (strictly `array<float>` —
  * the native kernels type-check at analysis; cast `array<double>`
  * embeddings with `transform(v, x => x.cast("float"))` first).
  *
  * The vector math is pure array expressions — `zip_with` for the products,
  * `aggregate` for the sequential sum — accumulating in double with a fixed
  * left-to-right order, so scores are bit-deterministic and reproducible in
  * other engines.
  *
  * Scale paths:
  *  - [[bruteForceTopK]]: broadcast the (tiny) query side, map over the
  *    corpus, one top-k reduction. Right answer, O(corpus) per query —
  *    the baseline.
  *  - [[signBuckets]] / [[annTopK]]: sign-projection LSH — bucket vectors
  *    by the sign pattern of selected components, probe only the query's
  *    bucket. Turns the scan into a bucket lookup; recall traded for a
  *    ~2^bits scan reduction. At cluster scale the bucket column becomes
  *    the partition/bucketing key so probes touch one partition.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in doubles, strict left-to-right — a native codegen'd catalyst
    * kernel ([[VecDotF]]); semantically identical to the
    * `aggregate(zip_with(...))` HOF formulation it replaces, but it stays in
    * whole-stage codegen instead of falling back to interpreted eval. */
  def dot(a: Column, b: Column): Column =
    GraftSqlShim.column(
      VecDotF(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a); val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }

  /** Exact top-k nearest to one query vector: broadcast-style scalar plan —
    * the query vector is a literal in the expression tree, so the scan side
    * never shuffles; only the k-row sort result moves. */
  def bruteForceTopK(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = lit(queryVec.toArray)
    corpus
      .select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** ANN index-quality evaluation: recall@k of the sign-bucket
    * multi-probe index ([[annTopK]]'s semantics, generalized to a query
    * SET) against exact brute force, per query — THE metric an
    * embedding pipeline watches before trusting an approximate index at
    * 100 TB ("is hamming≤1 multi-probe still ≥0.95 recall on this
    * corpus, or did the distribution drift?"). Recall@k =
    * |ann top-k ∩ brute top-k| / |brute top-k| — the denominator is the
    * ground truth's actual size (= min(k, corpus)), so a small corpus
    * or block can still score 1.0; both top-k sets rank by
    * (score desc, id) so ties are deterministic cross-engine.
    *
    * Plan shape: the (small) eval query set broadcasts into ONE scored
    * cross join — each corpus row scores against every query in a
    * single codegen'd pass ([[VecDotF]] dots), materialized once and
    * shared by both rankings; the ANN branch re-filters it by bucket
    * hamming (a narrow int xor/bit_count predicate) instead of
    * re-scoring. Only (qid, id, score) triples shuffle into the two
    * WindowGroupLimit-pruned rankings — k rows per query survive —
    * and the recall join is k-row-per-query tiny. Corpus vectors are
    * read once, never shuffled. */
  def annRecallAtK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      qidCol: String = "qid",
      qvecCol: String = "qvec",
      positions: Seq[Int] = defaultPositions,
      probeDist: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    require(probeDist >= 0 && probeDist <= positions.length,
      s"probeDist $probeDist outside [0, ${positions.length}]")
    val q = broadcast(queries.select(col(qidCol), col(qvecCol),
      signBucket(col(qvecCol), positions).as("__qb")))
    val scored = Materialize(
      corpus.select(col(idCol), col(vecCol),
          signBucket(col(vecCol), positions).as("__cb"))
        .crossJoin(q)
        .select(col(qidCol), col(idCol),
          cosine(col(vecCol), col(qvecCol)).as("score"),
          bit_count(col("__cb").bitwiseXOR(col("__qb"))).as("__ham")))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("score").desc, col(idCol))
    def topk(df: DataFrame): DataFrame = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(qidCol), col(idCol))
    val brute = topk(scored)
    val ann = topk(scored.filter(col("__ham") <= probeDist))
    val hits = ann.join(brute, Seq(qidCol, idCol))
      .groupBy(col(qidCol)).agg(count(lit(1)).as("n_hit"))
    // denominator = the brute top-k's ACTUAL size, not the constant k:
    // on a corpus (or block) smaller than k the ground truth has fewer
    // than k members, and dividing by k would cap recall below 1.0 —
    // understating index quality exactly where an eval fixture is small
    val bruteN = brute.groupBy(col(qidCol)).agg(count(lit(1)).as("n_brute"))
    // every query emits a row — an index missing EVERYTHING (recall 0)
    // must be visible, not absent
    queries.select(col(qidCol))
      .join(bruteN, Seq(qidCol), "left") // null only on an EMPTY corpus
      .join(hits, Seq(qidCol), "left")
      .withColumn("n_brute", coalesce(col("n_brute"), lit(k.toLong)))
      .select(col(qidCol),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_brute").cast("double")).as("recall"))
  }

  /** Integer dot product over `array<tinyint>` columns (the [[VecDotI8]]
    * kernel) — the int8 ANN inner loop, exact by construction. */
  def dotI8(a: Column, b: Column): Column =
    GraftSqlShim.column(
      VecDotI8(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Top-k cosine search over the int8-QUANTIZED corpus — the
    * quantize-then-search pattern a 100-TB embedding store actually runs:
    * [[quantizeInt8]] cuts storage/bandwidth 4× up front, and queries
    * score against the one-byte vectors without ever touching the
    * float32 originals. The scan reads only (id, q) — 4× less I/O than
    * the float path — and the integer dot products ([[dotI8]], a
    * codegen'd long accumulation) are EXACT, so the only IEEE operations
    * are one correctly-rounded sqrt and one division per row: scores are
    * bit-reproducible cross-engine, unlike float accumulation whose
    * ordering matters.
    *
    * Scoring: per-vector symmetric absmax quantization is
    * scale-invariant in the cosine — q(x) ≈ x·(127/m) component-wise —
    * so cos(q(a), q(b)) approximates cos(a, b) with only the rounding
    * error (≤ m/254 per component); the top-k over quantized scores is
    * the standard recall/bandwidth trade. The query vector is quantized
    * DRIVER-side with the identical `floor(x·127/m + 0.5)` IEEE
    * arithmetic and inlined as a literal, so the scan side never
    * shuffles; only k rows move (same plan shape as [[bruteForceTopK]]).
    * Zero vectors (scale 0) score 0 against everything, as in
    * [[cosine]]. */
  def int8TopK(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(queryVec.nonEmpty, "query vector must be non-empty")
    // engine-identical quantization of the query (same IEEE double ops
    // as quantizeStruct's generated code)
    val m = queryVec.map(x => math.abs(x.toDouble)).max
    val qq: Seq[Byte] =
      if (m > 0) queryVec.map(x =>
        math.floor(x.toDouble * 127.0 / m + 0.5).toByte)
      else queryVec.map(_ => 0: Byte)
    val nq2 = qq.map(b => b.toLong * b.toLong).sum
    val quant = quantizeInt8(corpus, idCol, vecCol)
    val di = dotI8(col("q"), typedlit(qq))
    val na2 = dotI8(col("q"), col("q"))
    quant
      .select(col(idCol),
        when(lit(nq2) > 0 && na2 > 0,
          di.cast("double") / sqrt((na2 * lit(nq2)).cast("double")))
          .otherwise(lit(0.0)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Sign-projection LSH bucket: bit i = sign of component positions(i).
    * Axis-aligned random hyperplanes — deterministic, engine-portable. */
  def signBucket(vec: Column, positions: Seq[Int]): Column =
    positions.zipWithIndex.map { case (p, i) =>
      when(element_at(vec, p) > 0, math.pow(2, i).toInt).otherwise(0)
    }.reduce(_ + _)

  val defaultPositions: Seq[Int] = Seq(1, 17, 33, 49)

  /** Bucketed ANN: probe the query's sign bucket AND every bucket within
    * hamming distance `probeDist` of it (multi-probe), then exact cosine
    * within the probed set. A vector near a sign hyperplane lands one bit
    * away from its true neighbors; probing the single exact bucket
    * silently misses them, so the default matches the hamming<=1
    * multi-probe the pair-generation path ([[cosineNearDupPairsLsh]])
    * already uses. With b bits, hamming<=1 probes b+1 of 2^b buckets —
    * still a ~(b+1)/2^b fraction of the corpus, and the bucket list is a
    * compile-time literal so the scan-side filter stays a narrow
    * codegen'd predicate (partition-prunable when the corpus is laid out
    * by bucket). */
  def annTopK(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      positions: Seq[Int] = defaultPositions,
      probeDist: Int = 1): DataFrame = {
    require(queryVec.length >= positions.max,
      s"query vector (dim ${queryVec.length}) shorter than max sign " +
        s"position ${positions.max}; pass positions within the embedding dim")
    require(probeDist >= 0 && probeDist <= positions.length,
      s"probeDist $probeDist outside [0, ${positions.length}]")
    val qBucket = positions.zipWithIndex
      .map { case (p, i) => if (queryVec(p - 1) > 0) 1 << i else 0 }.sum
    val probed = (0 until (1 << positions.length))
      .filter(b => Integer.bitCount(b ^ qBucket) <= probeDist)
    corpus
      .filter(signBucket(col(vecCol), positions)
        .isin(probed.map(Integer.valueOf): _*))
      .select(col(idCol), cosine(col(vecCol), lit(queryVec.toArray)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  def l2sq(a: Column, b: Column): Column =
    GraftSqlShim.column(
      VecL2F(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  // ---------------------------------------------------------------- IVF

  /** Coarse-quantizer assignment: nearest centroid by squared L2, ties to
    * the lower centroid id (argmin via `array_min` over (dist, cid)
    * structs — struct comparison is lexicographic). Centroids are a small
    * driver-side list (the IVF coarse codebook), compiled into the plan as
    * literals: the corpus never shuffles for assignment. */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Float]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(l2sq(vec, lit(c.toArray)).as("d"), lit(i).as("cid"))
    }
    array_min(array(scored: _*)).getField("cid")
  }

  /** Pick the SEED codebook deterministically: the first `k` corpus
    * vectors in id order — the starting point [[kmeansTrain]] refines
    * and the replayable baseline the correctness oracle needs. Use the
    * seed directly only for oracle replays; real corpora should feed
    * [[kmeansTrain]]'s output into [[ivfTopK]]/[[semanticDedup]] (same
    * `Seq[Seq[Float]]` shape, no downstream plan change), since an
    * untrained quantizer loses recall immediately. */
  def ivfCentroids(
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Float]] =
    corpus.orderBy(col(idCol)).select(col(vecCol)).limit(k)
      .collect().map(_.getSeq[Float](0).toSeq).toSeq

  /** IVF top-k: assign every vector to its nearest centroid (narrow, no
    * shuffle), probe only the `nprobe` centroids nearest the query, exact
    * cosine within the probed cells. At cluster scale the assignment is
    * precomputed once and the corpus is partitioned/bucketed by `ivf_cell`,
    * so a probe touches `nprobe/k` of the data. */
  def ivfTopK(
      corpus: DataFrame,
      centroids: Seq[Seq[Float]],
      queryVec: Seq[Float],
      k: Int = 10,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probed = probeCells(centroids, queryVec, nprobe)
    corpus
      .withColumn("__cell", ivfAssign(col(vecCol), centroids))
      .filter(col("__cell").isin(probed: _*))
      .select(col(idCol), cosine(col(vecCol), lit(queryVec.toArray)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** The `nprobe` centroid ids nearest the query (squared L2, ties to
    * the lower id — the [[ivfAssign]] tie rule). Driver-side: k×d
    * arithmetic on the codebook literals. */
  /** The `nprobe` nearest coarse cells to a query (squared L2, strict
    * left-to-right double sum — [[l2sq]]'s recipe — ties to the lower
    * cell id). Public so callers composing their OWN store layouts
    * (e.g. a snapshot-versioned cell-partitioned store read through
    * `Snapshots.scanPartitionAsOf`) share the exact probe-selection
    * arithmetic of the built-in probes. */
  def probeCells(
      centroids: Seq[Seq[Float]],
      queryVec: Seq[Float],
      nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(queryVec)
          .foldLeft(0.0) { case (acc, (x, q)) =>
            val dd = x.toDouble - q.toDouble; acc + dd * dd
          }
        (d, i)
      }
      .sorted.take(nprobe).map(_._2)

  /** Materialize [[ivfTopK]]'s claimed scale layout: the corpus written
    * CELL-PARTITIONED by its coarse-quantizer assignment, one directory
    * per cell. Built once per (corpus, codebook) generation — the index
    * build of an IVF system; [[ivfTopKPartitioned]] then probes it with
    * DIRECTORY-level pruning, so a query touches nprobe/k of the bytes
    * instead of mapping the whole corpus through the assignment
    * expression. Pair with [[saveCodebook]] next to the store so probe
    * jobs need neither the training corpus nor a retrain. */
  def writeIvfPartitioned(
      corpus: DataFrame,
      centroids: Seq[Seq[Float]],
      path: String,
      vecCol: String = "embedding"): Unit =
    corpus
      .withColumn("ivf_cell", ivfAssign(col(vecCol), centroids))
      .write.partitionBy("ivf_cell").mode("overwrite").parquet(path)

  /** IVF top-k over a [[writeIvfPartitioned]] store: the probed-cell
    * filter is a PARTITION filter (`ivf_cell` is the directory key), so
    * the scan plans a directory skip — unprobed cells contribute zero
    * files, the property `ScaleSpec` pins via the executed scan's
    * numFiles metric. Same results as [[ivfTopK]] over the same corpus
    * and codebook, bit for bit. */
  def ivfTopKPartitioned(
      spark: SparkSession,
      path: String,
      centroids: Seq[Seq[Float]],
      queryVec: Seq[Float],
      k: Int = 10,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probed = probeCells(centroids, queryVec, nprobe)
    spark.read.parquet(path)
      .filter(col("ivf_cell").isin(probed: _*))
      .select(col(idCol), cosine(col(vecCol), lit(queryVec.toArray)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** One Lloyd's iteration (k-means step): assign every vector to its
    * nearest centroid ([[ivfAssign]] — narrow, the centroids are plan
    * literals) and recompute per-cell means, emitted as one row per
    * (cell, dim) so the result is purely scalar.
    *
    * Sums are FIXED-POINT (`round(x·scale)` as long): a double sum's low
    * bits depend on partial-aggregation order, so a floating mean is not
    * reproducible run-to-run on a cluster — exact integer sums are
    * order-independent, making the step deterministic by construction
    * (the property a resumable training pipeline needs). The mean is one
    * IEEE division of exact integers. One map-side-combinable shuffle of
    * (cell, dim) partial sums; the driver then collects k×d rows to
    * build the next round's literal centroids — the classic Lloyd's
    * loop, where k×d is small by definition. */
  def kmeansStep(
      corpus: DataFrame,
      centroids: Seq[Seq[Float]],
      vecCol: String = "embedding",
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, "fixed-point scale must be positive")
    corpus
      .withColumn("cell", ivfAssign(col(vecCol), centroids))
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("x") * scale).cast("long")).as("sum_fp"))
      .select(col("cell").cast("long").as("cell"),
        col("dim").cast("long").as("dim"), col("n"),
        (col("sum_fp").cast("double") / (col("n") * scale)).as("mean"))
  }

  /** Lloyd's TRAINING loop: iterate [[kmeansStep]] until the codebook
    * stops moving (or `maxIters`), returning trained centroids that drop
    * straight into [[ivfTopK]] / [[semanticDedup]] / [[ivfAssign]] —
    * upgrading all of them from the "first k vectors in id order" seed
    * codebook, which loses recall immediately on any real corpus.
    *
    * The driver-side loop mirrors [[Dedup.connectedComponents]]'
    * iterate-and-observe shape: one distributed job per round, a small
    * driver-side fixed point between rounds. Here the per-round result
    * (k×d cell means) is ALREADY the k×d-sized object the next round
    * compiles into the plan as literals, so the collect that CC routes
    * through `observe()` is the codebook transfer itself — no extra
    * action, no corpus-sized data on the driver, and the centroid-shift
    * convergence test is free arithmetic on the two codebooks.
    *
    * Determinism by construction, inherited from [[kmeansStep]]'s
    * fixed-point sums: every round's means are order-independent exact
    * integers divided once, the float round-trip (`mean.toFloat`) is
    * IEEE round-to-nearest-even on both engines, and seeding
    * ([[ivfCentroids]] id order) is deterministic — so a fixed-iteration
    * replay reproduces the run bit-for-bit, which is what the
    * correctness oracle checks. A cell that goes empty keeps its
    * previous centroid (the deterministic standard fallback).
    *
    * `tol` is squared-L2 max centroid shift: stop when
    * `max_c ‖c_new − c_old‖² <= tol`. `tol = 0.0` stops only at exact
    * fixed point or `maxIters` — the fixed-iteration mode replays use. */
  def kmeansTrain(
      corpus: DataFrame,
      k: Int,
      maxIters: Int,
      tol: Double = 0.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      scale: Long = 1000000L): Seq[Seq[Float]] = {
    require(k > 0, "k must be positive")
    require(maxIters >= 0, "maxIters must be non-negative")
    require(tol >= 0.0, "tol must be non-negative")
    var cents = ivfCentroids(corpus, k, idCol, vecCol)
    // an empty corpus seeds an empty codebook; fail loudly here rather
    // than as an opaque empty.max inside the first training round
    require(cents.nonEmpty,
      "kmeansTrain: corpus has no vectors to seed a codebook from")
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val rows = kmeansStep(corpus, cents, vecCol, scale)
        .select(col("cell"), col("dim"), col("mean")).collect()
      val byCell = rows.groupBy(_.getLong(0))
      val next = cents.zipWithIndex.map { case (old, cid) =>
        byCell.get(cid.toLong) match {
          case Some(rs) =>
            rs.sortBy(_.getLong(1)).map(_.getDouble(2).toFloat).toSeq
          case None => old // empty cell: keep its centroid
        }
      }
      val shift = cents.zip(next).map { case (a, b) =>
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
          val d = x.toDouble - y.toDouble; acc + d * d
        }
      }.max
      cents = next
      iter += 1
      converged = shift <= tol
    }
    cents
  }

  /** Persist trained codebooks — flat ([[kmeansTrain]], wrapped as one
    * book) or PQ ([[pqTrain]], one book per subspace) — as a parquet
    * table of (book, cell, dim, val) rows, `val` kept as FLOAT so the
    * disk round-trip is bit-exact and a reloaded codebook reproduces
    * every downstream search ([[ivfTopK]], [[pqAdcTopK]],
    * [[semanticDedup]]) bit-for-bit. This is the train-weekly /
    * encode-daily split a production pipeline needs: the trainer runs
    * once and writes k×m×d floats; every encode/search job loads the
    * artifact instead of re-scanning the corpus to retrain. The write is
    * a single file on purpose — the artifact is a model, not data. */
  def saveCodebooks(
      spark: SparkSession,
      codebooks: Seq[Seq[Seq[Float]]],
      path: String): Unit = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "refusing to persist an empty codebook")
    import spark.implicits._
    val rows = for {
      (cb, b) <- codebooks.zipWithIndex
      (cent, c) <- cb.zipWithIndex
      (v, d) <- cent.zipWithIndex
    } yield (b, c, d, v)
    rows.toDF("book", "cell", "dim", "val")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load [[saveCodebooks]] output. Rebuilds nesting from the explicit
    * (book, cell, dim) indexes — never from row order, which parquet
    * does not promise — and fails loudly on a sparse/corrupt artifact
    * (a missing dim would silently shift every later coordinate left
    * and poison all downstream distances). */
  def loadCodebooks(
      spark: SparkSession,
      path: String): Seq[Seq[Seq[Float]]] = {
    // toSeq: index-vs-Range equality below needs Seq semantics (an
    // Array's == is reference equality and would fail every check)
    val rows = spark.read.parquet(path)
      .select(col("book"), col("cell"), col("dim"), col("val"))
      .collect().toSeq
    require(rows.nonEmpty, s"no codebook rows at $path")
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
    require(books.map(_._1) == books.indices,
      s"non-contiguous book ids at $path: ${books.map(_._1)}")
    books.map { case (b, bs) =>
      val cells = bs.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
      require(cells.map(_._1) == cells.indices,
        s"book $b: non-contiguous cell ids at $path")
      cells.map { case (c, cs) =>
        val dims = cs.sortBy(_.getInt(2))
        require(dims.map(_.getInt(2)) == dims.indices,
          s"book $b cell $c: missing/duplicate dims at $path")
        dims.map(_.getFloat(3)).toSeq
      }
    }
  }

  /** Flat-codebook convenience over [[saveCodebooks]]: one book. */
  def saveCodebook(
      spark: SparkSession,
      centroids: Seq[Seq[Float]],
      path: String): Unit =
    saveCodebooks(spark, Seq(centroids), path)

  /** Flat-codebook convenience over [[loadCodebooks]]. */
  def loadCodebook(spark: SparkSession, path: String): Seq[Seq[Float]] = {
    val books = loadCodebooks(spark, path)
    require(books.length == 1,
      s"expected one flat codebook at $path, found ${books.length} books")
    books.head
  }

  /** Product-quantization TRAINING: split the d-dim vector space into
    * `m` contiguous subspaces of d/m dims and train an independent
    * k-centroid codebook per subspace — the memory layout behind
    * billion-vector ANN indexes (Jégou et al., PAMI 2011): a float
    * vector compresses to m sub-codes (m bytes at k ≤ 256) while
    * distances remain approximable per-subspace, k^m effective cells
    * from m·k stored centroids where one flat codebook would need k^m.
    *
    * The m subspaces are independent by construction, so every round
    * runs ALL of them in ONE distributed job: the m sliced
    * [[kmeansStep]]s union into a single (book, cell, dim, mean) frame
    * and one collect feeds all m codebooks' next round. One seed
    * collect (the first k FULL vectors, sliced driver-side — the same
    * floats [[ivfCentroids]] on a sliced corpus returns) replaces m
    * seed jobs. Per-book arithmetic is untouched — same fixed-point
    * sums, same empty-cell/seed rules, and a book already at its exact
    * fixpoint recomputes to itself — so the trained codebooks are
    * bit-identical to the former m independent [[kmeansTrain]] loops
    * while a train pays 1 job per round + 1 seed job instead of
    * m·(rounds+1): the driver-loop job overhead, not the scan cost,
    * dominates a small-k training round. */
  def pqTrain(
      corpus: DataFrame,
      d: Int,
      m: Int,
      k: Int,
      maxIters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      scale: Long = 1000000L): Seq[Seq[Seq[Float]]] = {
    require(m >= 1, "need at least one subspace")
    require(d % m == 0, s"d=$d must split evenly into m=$m subspaces")
    require(maxIters >= 0, "maxIters must be non-negative")
    val sub = d / m
    val seed = ivfCentroids(corpus, k, idCol, vecCol)
    require(seed.nonEmpty,
      "pqTrain: corpus has no vectors to seed a codebook from")
    var books: Seq[Seq[Seq[Float]]] =
      (0 until m).map(j => seed.map(_.slice(j * sub, j * sub + sub)))
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val rows = (0 until m).map { j =>
        kmeansStep(
          corpus.select(slice(col(vecCol), j * sub + 1, sub).as(vecCol)),
          books(j), vecCol, scale)
          .select(lit(j).as("book"), col("cell"), col("dim"), col("mean"))
      }.reduce(_ unionByName _).collect()
      val byBook = rows.groupBy(_.getInt(0))
      var allConverged = true
      books = books.zipWithIndex.map { case (old, j) =>
        val byCell = byBook.getOrElse(j, Array.empty[Row])
          .groupBy(_.getLong(1))
        val next = old.zipWithIndex.map { case (oc, cid) =>
          byCell.get(cid.toLong) match {
            case Some(rs) =>
              rs.sortBy(_.getLong(2)).map(_.getDouble(3).toFloat).toSeq
            case None => oc // empty cell: keep its centroid
          }
        }
        val shift = old.zip(next).map { case (a, b) =>
          a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
            val dd = x.toDouble - y.toDouble; acc + dd * dd
          }
        }.max
        if (shift > 0.0) allConverged = false
        next
      }
      iter += 1
      converged = allConverged
    }
    books
  }

  /** PQ ENCODING: the m nearest-sub-centroid ids for a vector, as an
    * array<long>. Codebooks are plan literals ([[ivfAssign]] per
    * slice), so encoding is a narrow codegen'd projection — the corpus
    * never shuffles to be quantized. The subspace width is DERIVED from
    * the codewords (a free caller parameter here was a silent-zero
    * trap: a wrong width makes `VecL2F` null every distance and argmin
    * degenerate to code 0 corpus-wide). */
  def pqAssign(
      vec: Column,
      codebooks: Seq[Seq[Seq[Float]]]): Column = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "need at least one non-empty codebook")
    val sub = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == sub)),
      s"all codewords must share one subspace width (first is $sub)")
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      ivfAssign(slice(vec, j * sub + 1, sub), cb).cast("long")
    }: _*)
  }

  /** PQ asymmetric-distance (ADC) top-k: approximate nearest neighbors
    * scored from CODES alone. Per query, the k distances from each
    * query sub-slice to every sub-codeword are precomputed driver-side
    * into m lookup tables (m·k doubles — plan literals), and a row's
    * approximate distance is m `element_at` lookups summed in fixed
    * subspace order — no per-row vector arithmetic at all, which is
    * the entire point of PQ at billion-vector scale: the scan touches
    * m small ints per row, never the floats. Plan: narrow projection +
    * TakeOrderedAndProject.
    *
    * Determinism: LUT entries replicate the engine/oracle L2 recipe
    * exactly (sequential per-dim double sum — same order as `VecL2F`
    * and the oracle's `list_aggregate('sum')`), and the m-term score
    * sum is a fixed left-associated expression tree, not a float
    * reduction — so scores are bit-identical cross-engine. Ties break
    * to the lower id. */
  def pqAdcTopK(
      codes: DataFrame,
      codebooks: Seq[Seq[Seq[Float]]],
      queryVec: Seq[Float],
      k: Int = 10,
      idCol: String = "vec_id",
      codesCol: String = "codes"): DataFrame = {
    val m = codebooks.length
    require(m >= 1, "need at least one codebook")
    require(queryVec.length % m == 0,
      s"query dim ${queryVec.length} must split into m=$m subspaces")
    val sub = queryVec.length / m
    // a mismatched query dim would zip-truncate every LUT entry to a
    // PARTIAL distance — silently wrong ranking, so fail loudly
    require(codebooks.forall(_.forall(_.length == sub)),
      s"codeword dims must equal the query's subspace width $sub")
    val luts: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, j) =>
      val qs = queryVec.slice(j * sub, (j + 1) * sub)
      cb.map(_.zip(qs).foldLeft(0.0) { case (acc, (x, q)) =>
        val dd = x.toDouble - q.toDouble; acc + dd * dd
      })
    }
    val score = luts.zipWithIndex.map { case (lut, j) =>
      element_at(lit(lut.toArray),
        element_at(col(codesCol), j + 1).cast("int") + 1)
    }.reduce(_ + _)
    codes.select(col(idCol), score.as("adist"))
      .orderBy(col("adist").asc, col(idCol)).limit(k)
  }

  // ------------------------------------------------------- IVF-PQ composite

  /** The IVF-PQ composite index build — the standard billion-vector
    * layout (Jégou et al., PAMI 2011; the FAISS `IVFPQ` family): every
    * vector is coarse-assigned to an IVF cell AND compressed to its m
    * PQ sub-codes, and the store persists ONLY (id, codes) rows,
    * partitioned by cell. Raw vectors never reach the store: a probe
    * job reads m small ints per row from nprobe/k of the directories —
    * the two pruning axes (directory skip × code-only bytes) multiply.
    * Both assignments are literal-codebook narrow projections
    * ([[ivfAssign]]/[[pqAssign]]), so the build is one scan of the
    * corpus with no shuffle beyond the partitioned write itself.
    *
    * Codes here quantize the RAW vector, not the cell residual
    * (`by_residual=false` in FAISS terms): one shared LUT set serves
    * every probed cell, keeping the ADC scan a pure literal-lookup
    * projection. Recall at equal code budget is lower; the residual
    * variant ([[writeIvfPqResidualPartitioned]]/[[ivfPqResidualTopK]])
    * is the higher-recall sibling, at the cost of per-cell LUTs. */
  def writeIvfPqPartitioned(
      corpus: DataFrame,
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    corpus
      .select(col(idCol),
        pqAssign(col(vecCol), codebooks).as("codes"),
        ivfAssign(col(vecCol), centroids).as("ivf_cell"))
      .write.partitionBy("ivf_cell").mode("overwrite").parquet(path)

  /** Top-k over a [[writeIvfPqPartitioned]] store: the probed-cell
    * filter is a PARTITION filter (directory skip — unprobed cells
    * contribute zero files), and within the probed cells the scan reads
    * codes only (the store HAS no vector column) for [[pqAdcTopK]]'s
    * LUT-sum scoring. `ScaleSpec` pins both properties via the executed
    * scan's numFiles and its ReadSchema. Same ranking as [[pqAdcTopK]]
    * over the probed subset, bit for bit. */
  def ivfPqTopK(
      spark: SparkSession,
      path: String,
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      queryVec: Seq[Float],
      k: Int = 10,
      nprobe: Int = 2,
      idCol: String = "vec_id"): DataFrame = {
    val probed = probeCells(centroids, queryVec, nprobe)
    pqAdcTopK(
      spark.read.parquet(path).filter(col("ivf_cell").isin(probed: _*)),
      codebooks, queryVec, k, idCol)
  }

  /** FILTERED top-k over an IVF-PQ store — "nearest neighbors among
    * rows satisfying a metadata predicate", the most-requested vector
    * search feature (per-source retrieval, date-scoped dedup,
    * tenant-scoped serving). Semantics are PRE-filter: the ranking
    * runs over probed-cells ∩ `allowed`, so exactly `k` survivors
    * return whenever that intersection has k rows — the alternative
    * (rank first, filter after) silently returns fewer than k the
    * moment the filter is selective, which is a recall bug, not a
    * variant. `allowed` is an id frame (join the metadata table and
    * filter upstream — the store itself stays codes-only); it
    * left-semi-joins the partition-pruned codes scan, so at scale a
    * selective filter also SHRINKS the ADC work instead of wasting it
    * on rows the filter would discard. Ranking arithmetic is
    * [[pqAdcTopK]]'s verbatim. */
  def ivfPqTopKFiltered(
      spark: SparkSession,
      path: String,
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      queryVec: Seq[Float],
      allowed: DataFrame,
      k: Int = 10,
      nprobe: Int = 2,
      idCol: String = "vec_id"): DataFrame = {
    require(allowed.columns.contains(idCol),
      s"ivfPqTopKFiltered: allowed frame has no column '$idCol'")
    val probed = probeCells(centroids, queryVec, nprobe)
    pqAdcTopK(
      spark.read.parquet(path)
        .filter(col("ivf_cell").isin(probed: _*))
        .join(allowed.select(col(idCol)), Seq(idCol), "left_semi"),
      codebooks, queryVec, k, idCol)
  }

  /** BATCHED multi-query top-k over an IVF-PQ store — the serving
    * shape: a query FRAME joins its probed cells in ONE job instead of
    * a driver loop unioning one subplan per query (the eval-harness
    * compromise this replaces; a 10k-query eval suite cannot be 10k
    * jobs). Plan, stage by stage, all distributed:
    *
    *   1. probe assignment — queries × the (tiny, broadcast) centroid
    *      table, scored by the same [[l2sq]] kernel the driver-side
    *      `probeCells` folds, top-`nprobe` cells per query via a
    *      rank-≤-n window (WindowGroupLimit: map-side truncation);
    *   2. per-(query, cell) LUTs — each probe row carries its m lookup
    *      tables as array columns, built by `transform` over the
    *      literal codebooks with the SAME strict left-to-right
    *      double-sum as [[pqAdcTopK]]'s driver-side LUTs (residual
    *      mode first subtracts the probed centroid, double-subtract
    *      rounded once to float — [[residuals]]' pinned recipe);
    *   3. the probe frame (queries × nprobe rows, m·k doubles wide)
    *      broadcasts into an equi-join with the store on `ivf_cell` —
    *      the join key IS the store's partition column, so unprobed
    *      cells prune at the directory level and each store row meets
    *      only the queries probing its cell;
    *   4. ADC scoring is the fixed-order m-term `element_at` sum over
    *      the CARRIED lut columns (same expression shape as
    *      [[pqAdcTopK]], literals swapped for columns), and per-query
    *      top-k is a rank-≤-k window on (adist, id).
    *
    * Bit-equality with the per-query loop ([[ivfPqTopK]] /
    * [[ivfPqResidualTopK]]) is pinned in `SimilaritySpec`: same probe
    * sets, same LUT doubles, same score trees, same tie order. The
    * residual loop's per-cell `limit(k)` before its global top-k drops
    * only rows the global rank drops anyway, so skipping it here
    * changes nothing. */
  def ivfPqTopKBatch(
      spark: SparkSession,
      path: String,
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 2,
      byResidual: Boolean = false,
      idCol: String = "vec_id",
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = codebooks.length
    require(m >= 1, "need at least one codebook")
    val sub = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == sub)),
      s"all codewords must share one subspace width (first is $sub)")
    require(centroids.nonEmpty && centroids.head.length == m * sub,
      s"centroid dim ${centroids.headOption.fold(0)(_.length)} must equal " +
        s"m·sub = ${m * sub}")
    import spark.implicits._
    val cells = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("ivf_cell", "__cent")
    val pw = Window.partitionBy(col(qidCol))
      .orderBy(col("__cd").asc, col("ivf_cell").asc)
    val probed = queries
      .crossJoin(broadcast(cells))
      .withColumn("__cd", l2sq(col(qvecCol), col("__cent")))
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nprobe)
    // the vector the LUTs measure from: the query itself (shared-LUT
    // raw mode) or its residual against the probed cell's centroid
    val lutVec =
      if (byResidual)
        zip_with(col(qvecCol), col("__cent"),
          (a, b) => (a.cast("double") - b.cast("double")).cast("float"))
      else col(qvecCol)
    val withLuts = probed.select(
      Seq(col(qidCol), col("ivf_cell")) ++
        codebooks.zipWithIndex.map { case (cb, j) =>
          transform(typedLit(cb.map(_.toSeq)),
            w => l2sq(slice(lutVec, j * sub + 1, sub), w))
            .as(s"__lut$j")
        }: _*)
    val score = (0 until m).map { j =>
      element_at(col(s"__lut$j"),
        element_at(col("codes"), j + 1).cast("int") + 1)
    }.reduce(_ + _)
    val kw = Window.partitionBy(col(qidCol))
      .orderBy(col("adist").asc, col(idCol).asc)
    spark.read.parquet(path)
      .join(broadcast(withLuts), Seq("ivf_cell"))
      .select(col(qidCol), col(idCol), score.as("adist"))
      .withColumn("__rn", row_number().over(kw))
      .filter(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("adist"))
  }

  /** Append each row's coarse cell AND its cell residual (`vec −
    * centroid[cell]`, the vector PQ quantizes in FAISS's default
    * `by_residual=true` mode) as columns `ivf_cell` / `__rv`. Residual
    * components are computed as a DOUBLE subtraction rounded once to
    * FLOAT — the explicitly two-step form both engines reproduce
    * bit-identically (a float-typed subtract would leave the rounding
    * point implementation-defined). Narrow: the centroid table is a
    * k×d literal, so no join and no shuffle. */
  def residuals(
      corpus: DataFrame,
      centroids: Seq[Seq[Float]],
      vecCol: String = "embedding"): DataFrame = {
    val cents2d = typedLit(centroids.map(_.toSeq))
    corpus
      .withColumn("ivf_cell", ivfAssign(col(vecCol), centroids))
      .withColumn("__rv",
        zip_with(col(vecCol), element_at(cents2d, col("ivf_cell") + 1),
          (a, b) => (a.cast("double") - b.cast("double")).cast("float")))
  }

  /** [[pqTrain]] over the RESIDUAL corpus — the codebooks that pair with
    * [[writeIvfPqResidualPartitioned]]. Residuals cluster far tighter
    * than raw vectors (the coarse quantizer has already absorbed the
    * between-cell variance), which is where the residual variant's
    * recall edge comes from. */
  def pqTrainResidual(
      corpus: DataFrame,
      centroids: Seq[Seq[Float]],
      d: Int,
      m: Int,
      k: Int,
      maxIters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Seq[Float]]] =
    pqTrain(
      residuals(corpus, centroids, vecCol)
        .select(col(idCol), col("__rv").as(vecCol)),
      d, m, k, maxIters, idCol, vecCol)

  /** The residual IVF-PQ store: same codes-only cell-partitioned layout
    * as [[writeIvfPqPartitioned]], but codes quantize the CELL RESIDUAL
    * (FAISS `by_residual=true`) under residual-trained codebooks. */
  def writeIvfPqResidualPartitioned(
      corpus: DataFrame,
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    residuals(corpus, centroids, vecCol)
      .select(col(idCol),
        pqAssign(col("__rv"), codebooks).as("codes"),
        col("ivf_cell"))
      .write.partitionBy("ivf_cell").mode("overwrite").parquet(path)

  /** Top-k over a [[writeIvfPqResidualPartitioned]] store. ADC against a
    * residual code needs the QUERY's residual relative to that row's
    * cell — so each probed cell gets its own LUT set (built from
    * `query − centroid[cell]`, the same double-subtract-round recipe as
    * the stored side) and its own partition-pruned codes-only scan; the
    * nprobe per-cell top-k frames union into one global top-k. Scores
    * all approximate the same `‖x − q‖²`, so cross-cell ranking is
    * well-defined. nprobe stays a handful by construction — the union
    * is nprobe · k rows, not a fan-out. */
  def ivfPqResidualTopK(
      spark: SparkSession,
      path: String,
      centroids: Seq[Seq[Float]],
      codebooks: Seq[Seq[Seq[Float]]],
      queryVec: Seq[Float],
      k: Int = 10,
      nprobe: Int = 2,
      idCol: String = "vec_id"): DataFrame = {
    val probed = probeCells(centroids, queryVec, nprobe)
    probed.map { c =>
      val resQ = queryVec.zip(centroids(c))
        .map { case (q, ci) => (q.toDouble - ci.toDouble).toFloat }
      pqAdcTopK(
        spark.read.parquet(path).filter(col("ivf_cell") === c),
        codebooks, resQ, k, idCol)
    }.reduce(_ unionByName _)
      .orderBy(col("adist").asc, col(idCol)).limit(k)
  }

  /** Embedding-distribution DRIFT monitor: per-(label, dim) mean gap
    * between two corpus slices — the check a continuously-ingesting
    * embedding pipeline runs before trusting trained artifacts
    * (codebooks, LSH thresholds, quantizer scales) on new data: a moved
    * centroid means yesterday's cells no longer describe today's
    * vectors. Emitting the per-dimension gap rather than one aggregate
    * distance keeps every number engine-exact (a summed distance would
    * reintroduce float-addition order) and tells the operator WHICH
    * dimensions moved — drift localized to a few dims is usually an
    * upstream feature bug, uniform drift a genuine distribution shift.
    *
    * Arithmetic is [[kmeansStep]]'s fixed-point contract: per-slice sums
    * of `round(x·scale)` longs (order-independent), one IEEE division
    * per mean, one exactly-rounded subtraction for the gap. Two
    * map-side-combinable aggregations + one (label×d)-sized join; the
    * vectors themselves shuffle only as (label, dim, fx) triples.
    * Labels present in only one slice drop (inner join): drift of an
    * appearing/disappearing label is a cardinality question
    * ([[graft.operators.IncrementalAgg]] territory), not a mean gap. */
  def centroidDrift(
      base: DataFrame,
      delta: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding",
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, "fixed-point scale must be positive")
    def slice(df: DataFrame, nCol: String, sCol: String) = df
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(count(lit(1)).as(nCol),
        sum(round(col("x") * scale).cast("long")).as(sCol))
    val meanB = col("__sb").cast("double") / (col("n_base") * scale)
    val meanD = col("__sd").cast("double") / (col("n_delta") * scale)
    slice(base, "n_base", "__sb")
      .join(slice(delta, "n_delta", "__sd"), Seq(labelCol, "dim"))
      .select(col(labelCol), col("dim").cast("long").as("dim"),
        col("n_base"), col("n_delta"),
        meanB.as("mean_base"), meanD.as("mean_delta"),
        abs(meanB - meanD).as("gap"))
  }

  /** The int8 quantization as ONE struct-valued column expression —
    * `struct<q_scale: double, q: array<tinyint>>` — registered in SQL as
    * `vec_quantize_int8`. Components are TINYINT (one byte), so the 4×
    * storage/bandwidth cut is realized in the output itself, not left to
    * a downstream recast. The absmax is let-bound via a one-element
    * `transform` (the [[Dedup.shingles]] pattern): referencing a sibling
    * projection column inside the per-element lambda would get re-inlined
    * by CollapseProject and recompute the O(d) absmax PER ELEMENT. */
  def quantizeStruct(vec: Column): Column =
    element_at(
      transform(array(array_max(transform(vec, x => abs(x.cast("double"))))),
        m => struct(
          coalesce(m, lit(0.0)).as("q_scale"),
          when(m > 0,
            transform(vec, x =>
              floor(x.cast("double") * 127.0 / m + 0.5).cast("tinyint")))
            .otherwise(transform(vec, _ => lit(0).cast("tinyint"))).as("q"))),
      1)

  /** Scalar int8 quantization of an embedding column — the 4× storage /
    * bandwidth cut a 100-TB embedding corpus takes before indexing
    * (per-vector absmax scaling, the standard symmetric scheme):
    * `q_i = floor(x_i · 127 / m + 0.5)` with `m = max |x_i|`, so
    * `q ∈ [−127, 127]` and `x ≈ q · m / 127` within `m/254` per
    * component. Zero vectors quantize to zeros with scale 0.
    *
    * `floor(· + 0.5)` rather than `round()`: half-up-toward-+∞ via
    * floor is the same IEEE operation in every engine, where round()'s
    * half-handling differs (HALF_UP BigDecimal in Spark, away-from-zero
    * in others) — the choice that keeps the oracle hash-exact. A narrow
    * codegen'd projection — no shuffle, no helper columns touched on the
    * caller's frame (both fields extract from the [[quantizeStruct]]
    * expression in one projection; codegen CSEs the top-level duplicate).
    * Output adds (`q_scale`, `q` : array<tinyint> — one byte per
    * component, so the cut lands in storage, not just in range). */
  def quantizeInt8(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = quantizeStruct(col(vecCol))
    df.select(col("*"), q.getField("q_scale").as("q_scale"),
      q.getField("q").as("q"))
  }

  /** Semantic dedup (SemDeDup-shaped): cluster the corpus with the coarse
    * quantizer, then within each cell drop every vector whose cosine to a
    * LOWER-id cell-mate reaches `tau` — the min-id member of each
    * near-dup chain survives, deterministically. Returns survivors with
    * their cell.
    *
    * Why this scales where all-pairs cosine cannot: candidate pairs are
    * confined to a cell, so the join is one hash shuffle on `cell` per
    * side and the quadratic blow-up is bounded per cell (k trades recall
    * for cell size exactly as in IVF search; a trained codebook drops in
    * unchanged — train one with [[kmeansTrain]]). Assignment itself is
    * narrow — centroids are plan literals. Norms are computed once per
    * row before the self-join (the [[cosineNearDupPairs]] lesson). The
    * final anti-join carries no broadcast HINT: the dropped-id frame
    * scales with the corpus near-dup rate, so a forced broadcast would
    * hard-fail exactly on the duplicate-heavy corpora dedup exists for,
    * while AQE still broadcasts from runtime stats when it is small. */
  def semanticDedup(
      df: DataFrame,
      centroids: Seq[Seq[Float]],
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = df.select(col(idCol), col(vecCol),
      ivfAssign(col(vecCol), centroids).as("cell"),
      norm(col(vecCol)).as("nrm"))
    val l = assigned.select(col("cell"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("nrm").as("na"))
    val r = assigned.select(col("cell"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("nrm").as("nb"))
    val dropped = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("na") > 0 && col("nb") > 0 &&
        dot(col("va"), col("vb")) / (col("na") * col("nb")) >= tau)
      .select(col("id_b").as(idCol))
      .distinct()
    assigned.select(col(idCol), col("cell"))
      .join(dropped, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-duplicate pairs, blocked on an existing
    * low-cardinality key. A label block is quadratic *per label* — fine
    * when labels are plentiful, hopeless when a label holds 10⁸ vectors;
    * [[cosineNearDupPairsLsh]] is the corpus-scale variant (sign-bucket
    * blocking, bounded per-bucket expansion).
    *
    * Norms are computed once per row *before* the join — the naive
    * `cosine(va, vb)` per pair spends 2/3 of its work recomputing
    * `‖a‖`/`‖b‖` for every partner; per-pair work here is a single
    * codegen'd dot product plus one division. */
  def cosineNearDupPairs(
      df: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      blockCol: String = "label"): DataFrame = {
    val prep = df.select(col(blockCol).as("blk"), col(idCol), col(vecCol),
      norm(col(vecCol)).as("nrm"))
    val l = prep.select(col("blk"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("nrm").as("na"))
    val r = prep.select(col("blk"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("nrm").as("nb"))
    l.join(r, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score",
        when(col("na") > 0 && col("nb") > 0,
          dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .otherwise(lit(0.0)))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  // ------------------------------------------- exact-dup pre-collapse

  /** Digest keying EXACT (bit-identical) duplicate vectors: md5 of the
    * vector's canonical string form. Cast-to-string of `array<float>` is
    * deterministic (fixed float formatting, fixed element order), so two
    * rows share a digest iff their vectors are bit-identical — with two
    * documented edge cases at the contract's margin: every NaN bit
    * pattern formats as "NaN" (all-NaN vectors collapse into one class;
    * harmless — cosine over NaN is garbage either way), and `0.0f` vs
    * `-0.0f` format differently (equal-comparing vectors split into two
    * classes; they still meet through the LSH probe join, both landing
    * in the non-positive sign bucket). */
  def vecDigest(vec: Column): Column = md5(vec.cast("string"))

  /** (id, vector, digest) — the shared projection both the member map
    * and the class frame derive from. Deliberately LAZY (not
    * materialized): its two consumers each materialize their own
    * downstream frame — the NARROW (digest, id) member map and the
    * class-sized [[vecClasses]] output (which carries one vector per
    * distinct class) — so the corpus-sized vector column is never
    * persisted. The cost is the digest/scan running once per
    * materialization (twice total) instead of once; an md5 over the scan
    * is cheap where corpus-sized executor-local storage is the thing
    * that kills a 100-TB job.
    *
    * CONSISTENCY CONTRACT the split materialization adds: the two
    * evaluations must see the same rows, so the input frame must be
    * deterministic and stable across the two eager jobs (the norm for a
    * parquet-backed corpus). A nondeterministic input (unseeded sample,
    * nondeterministic UDF, a table written to mid-job) would give the
    * member map and the class frame different digests, silently dropping
    * docs at the equi-join — such callers must materialize their frame
    * themselves before calling in. */
  private def keyedVectors(
      df: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol), vecDigest(col(vecCol)).as("__vg"))

  /** One row per DISTINCT vector value — the duplicate-class frame the
    * LSH paths run over instead of the raw corpus. A duplicate-heavy
    * input (1M copies of a boilerplate page's embedding) collapses to
    * one row here, so identical vectors can never pile into one LSH
    * bucket and go quadratic — the failure mode adding sign positions
    * can never fix, because identical vectors share every sign pattern.
    * One map-side-combinable groupBy on the 16-byte digest; the class
    * representative is the min-id member (`min_by` keeps its vector, so
    * norms/buckets are computed once per class). Output: (__vg, rep_id,
    * vecCol, cls_n, nrm, bkt). */
  private def vecClasses(
      keyed: DataFrame,
      idCol: String,
      vecCol: String,
      positions: Seq[Int]): DataFrame =
    keyed
      .groupBy(col("__vg"))
      .agg(min(col(idCol)).as("rep_id"),
        min_by(col(vecCol), col(idCol)).as(vecCol),
        count(lit(1)).as("cls_n"))
      .select(col("__vg"), col("rep_id"), col(vecCol), col("cls_n"),
        norm(col(vecCol)).as("nrm"),
        signBucket(col(vecCol), positions).as("bkt"))

  /** Drop classes whose sign bucket holds more than `maxBucket` DISTINCT
    * vectors (0 disables). Post-collapse the count measures genuine
    * pairwise work — identical vectors are already one class — so an
    * oversized bucket means a mass of distinct-but-sign-identical
    * vectors, whose quadratic expansion is exactly what OOMs a reducer;
    * recall there is traded for boundedness, observably via
    * [[lshOversizedBuckets]].
    *
    * Sizing the cap is the CALLER's job, against the bucket-key
    * cardinality: the bucket space is only 2^|positions| (16 with
    * [[defaultPositions]]), so by pigeonhole any corpus with more than
    * `maxBucket · 2^|positions|` distinct vectors has EVERY bucket over
    * the cap and the capped output goes empty — which is why the cap is
    * opt-in (default 0), unlike [[Dedup.minhashCandidates]] whose bucket
    * space is a 2^32 hash. When capping, add sign positions until
    * `maxBucket · 2^|positions|` comfortably exceeds the expected
    * distinct-vector count, and watch [[lshOversizedBuckets]].
    *
    * Shape: a map-side-combinable groupBy builds the (tiny) oversized
    * bucket id list, broadcast back as an anti-join — the class frame
    * itself never shuffles for the cap. (A window `count over
    * (partition by bkt)` would funnel the whole class frame into at most
    * 2^|positions| partitions — a per-bucket single-task bottleneck at
    * exactly the scale the cap targets.) */
  private def capBuckets(classes: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) classes
    else {
      val oversized = classes
        .groupBy(col("bkt")).agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") > maxBucket)
        .select(col("bkt"))
      classes.join(broadcast(oversized), Seq("bkt"), "left_anti")
    }

  /** The buckets the LSH paths' `maxBucket` cap would drop, with their
    * DISTINCT-vector counts (`n_classes` — what the cap tests) and their
    * member-row counts (`n_members` — the actual recall exposure, which
    * a large duplicate class dominates) — run/log this per job so the
    * cap is an observable policy, not silent recall loss (the
    * [[Dedup.minhashOversizedBuckets]] analog). */
  def lshOversizedBuckets(
      df: DataFrame,
      maxBucket: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      positions: Seq[Int] = defaultPositions): DataFrame =
    vecClasses(
      df.select(col(idCol), col(vecCol),
        vecDigest(col(vecCol)).as("__vg")),
      idCol, vecCol, positions)
      .groupBy(col("bkt")).agg(count(lit(1)).as("n_classes"),
        sum(col("cls_n")).as("n_members"))
      .filter(col("n_classes") > maxBucket)

  /** Embedding-cosine near-duplicate pairs blocked on the [[signBucket]]
    * LSH key — the 100-TB shape: per-bucket expansion is bounded by the
    * bucket's share of the corpus (~n/2^bits for balanced components),
    * and adding sign positions subdivides hot buckets further, where a
    * label block can never be subdivided.
    *
    * Duplicate-heavy corpora are handled by construction: the probe join
    * runs over [[vecClasses]] (one row per distinct vector), so n copies
    * of one vector cost one join row, and member pairs re-expand from
    * the digest→id map afterwards — intra-class pairs all share the
    * self-cosine score, inter-class pairs the rep-pair score, both
    * computed by the identical expression the uncollapsed join would
    * evaluate (bit-equal results). `maxBucket` (OPT-IN, default 0 = no
    * cap) then caps the residual hot-bucket case — many DISTINCT vectors
    * sharing a sign pattern. Size it against the 2^|positions| bucket
    * space per the [[capBuckets]] pigeonhole note, and observe drops via
    * [[lshOversizedBuckets]]. The cap bounds only the INTER-class probe
    * join; intra-class (exact-duplicate) pairs are generated from the
    * uncapped class frame, so bit-identical duplicates — the
    * highest-confidence pairs, which contribute nothing to the quadratic
    * work the cap exists to bound — never vanish when unrelated distinct
    * vectors crowd their bucket.
    *
    * NOTE the output contract itself is quadratic on duplicate-heavy
    * input: an n-copy class re-expands to C(n,2) intra pairs (1M copies
    * → 5·10¹¹ rows), regardless of how bounded candidate GENERATION is.
    * At corpus scale the pair frame is an audit artifact — cap or sample
    * it; the linear-output deliverables are the cluster/survivor frames
    * ([[Dedup.connectedComponents]] over these pairs, or exact-dup
    * survivors straight from [[vecClasses]]' (digest, rep_id) map).
    *
    * Multi-probe for recall: with `probe1 = true` a pair is emitted when
    * the two sign patterns agree on ALL positions or differ on exactly
    * one (hamming ≤ 1) — the right side explodes to its own bucket plus
    * its |positions| hamming-1 neighbors, the left joins on its true
    * bucket only, so each qualifying class pair matches exactly once
    * (its bucket distance picks out exactly one probe) and needs no
    * distinct. Norms are computed once per class before the join, as in
    * [[cosineNearDupPairs]]. */
  def cosineNearDupPairsLsh(
      df: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      positions: Seq[Int] = defaultPositions,
      probe1: Boolean = true,
      maxBucket: Int = 0): DataFrame = {
    // two narrow materializations, zero corpus-sized persists: the
    // member map is (16-byte digest, id) and the class frame holds one
    // vector per DISTINCT class — the full (id, vector, digest)
    // projection itself stays lazy (see keyedVectors)
    val keyed = keyedVectors(df, idCol, vecCol)
    val members = Materialize(keyed.select(col("__vg"), col(idCol)))
    // materialize the per-class frame too: it feeds both probe-join
    // sides plus the intra-class path, and the digest groupBy otherwise
    // re-runs per consumer (same rationale as Dedup.simhashNearDupPairs)
    val classes = Materialize(vecClasses(keyed, idCol, vecCol, positions))
    val reps = capBuckets(classes, maxBucket)
    val probes =
      if (probe1)
        array((col("bkt") +: positions.indices.map(i =>
          col("bkt").bitwiseXOR(lit(1 << i)))): _*)
      else array(col("bkt"))
    val l = reps.select(col("bkt"), col("__vg").as("vg_a"),
      col("rep_id").as("ra"), col(vecCol).as("va"), col("nrm").as("na"))
    val r = reps.select(col("__vg").as("vg_b"), col("rep_id").as("rb"),
      col(vecCol).as("vb"), col("nrm").as("nb"), explode(probes).as("bkt"))
    val interRep = l.join(r, Seq("bkt"))
      .filter(col("ra") < col("rb"))
      .withColumn("score",
        when(col("na") > 0 && col("nb") > 0,
          dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .otherwise(lit(0.0)))
      .filter(col("score") >= threshold)
      .select(col("vg_a"), col("vg_b"), col("score"))
    // classes are disjoint, so each unordered member pair appears exactly
    // once in the expansion join — least/greatest orients it
    val inter = interRep
      .join(members.select(col("__vg").as("vg_a"), col(idCol).as("__ia")),
        Seq("vg_a"))
      .join(members.select(col("__vg").as("vg_b"), col(idCol).as("__ib")),
        Seq("vg_b"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("score"))
    // identical vectors always share a bucket, so class-mates are always
    // candidates; their pair score is the self-cosine (d/(nrm·nrm), the
    // exact value the uncollapsed per-pair expression yields for two
    // bit-identical vectors — NOT a shortcut literal 1.0, which would
    // differ in the last ulp). Built from the UNCAPPED class frame: the
    // cap's purpose is bounding inter-class expansion, and intra pairs
    // are per-class work the bucket population doesn't change.
    val selfRep = classes.filter(col("cls_n") > 1)
      .withColumn("score",
        when(col("nrm") > 0,
          dot(col(vecCol), col(vecCol)) / (col("nrm") * col("nrm")))
          .otherwise(lit(0.0)))
      .filter(col("score") >= threshold)
      .select(col("__vg"), col("score"))
    val intra = selfRep
      .join(members.select(col("__vg"), col(idCol).as("id_a")), Seq("__vg"))
      .join(members.select(col("__vg"), col(idCol).as("id_b")), Seq("__vg"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("score"))
    inter.unionByName(intra)
  }

  /** Batch k-nearest-neighbors self-join: for EVERY vector, its top-k
    * cosine neighbors among the hamming<=1 sign-bucket candidates — the
    * all-vectors ANN workload (clustering, graph building, semantic
    * dedup), where [[annTopK]] answers one query point.
    *
    * Shape chosen for scale: candidate generation is the same
    * class-collapsed probe-explode join as [[cosineNearDupPairsLsh]] —
    * one row per DISTINCT vector ([[vecClasses]]), `maxBucket` (OPT-IN,
    * default 0; size against the 2^|positions| bucket space per the
    * [[capBuckets]] pigeonhole note) capping distinct-vector bucket
    * population — so duplicate-heavy corpora (the workload dedup exists
    * for) cost one candidate row per class pair, not one per member
    * pair. The cap bounds only INTER-class candidates: a capped class
    * still yields its class-mate (exact-duplicate) neighbors via the
    * uncapped self-candidate path, but loses inter-class neighbors —
    * i.e. under an active cap the "top-k for every vector" contract
    * weakens to "top-k among surviving candidates" for members of
    * oversized buckets, observably via [[lshOversizedBuckets]]. Vector
    * math happens only at class level; member expansion is
    * provably-lossless pruned re-joining:
    *  - per candidate class, only its k+1 SMALLEST member ids expand
    *    (class-mates tie on score, so rank falls to the id tie-break:
    *    anything past the k+1 smallest has k non-self class-mates ahead
    *    of it and can never enter a top-k);
    *  - per query class, only the k+1 best candidate classes by
    *    (score desc, min-member-id asc) expand (each kept class
    *    contributes at least its min member, ranked above every member
    *    of a dropped class; at most one of those k+1 is the query row
    *    itself, leaving ≥ k ahead of any dropped-class member).
    * Both prunes and the final per-vector top-k are `row_number <= n`
    * windows, which plan as Partial+Final WindowGroupLimit: map tasks
    * truncate groups BEFORE the shuffle, so exchanges carry O(k) rows
    * per group, not full candidate sets. No driver collect, no global
    * sort.
    *
    * Output: (idCol, nbr_id, score, nbr_rank), nbr_rank 1..k. Vectors
    * whose probed buckets hold no other vector emit no rows (at corpus
    * scale add sign positions to subdivide hot buckets, not fewer to fill
    * empty ones). */
  def knnSelfJoin(
      df: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      positions: Seq[Int] = defaultPositions,
      probe1: Boolean = true,
      maxBucket: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val keyed = keyedVectors(df, idCol, vecCol)
    val members = Materialize(keyed.select(col("__vg"), col(idCol)))
    val classes = Materialize(vecClasses(keyed, idCol, vecCol, positions))
    val reps = capBuckets(classes, maxBucket)
    val probes =
      if (probe1)
        array((col("bkt") +: positions.indices.map(i =>
          col("bkt").bitwiseXOR(lit(1 << i)))): _*)
      else array(col("bkt"))
    val l = reps.select(col("bkt"), col("__vg").as("vg_a"),
      col(vecCol).as("va"), col("nrm").as("na"))
    val r = reps.select(col("__vg").as("vg_b"), col("rep_id").as("rb"),
      col(vecCol).as("vb"), col("nrm").as("nb"), explode(probes).as("bkt"))
    // directed class-level candidates in two parts: INTER-class pairs
    // from the capped probe join, plus every class as its OWN neighbor
    // class (a class with 2+ members supplies its members' class-mates;
    // the member-level id filter kills singleton self-pairs) from the
    // UNCAPPED frame — so a capped-out class keeps its exact-dup
    // class-mates even when unrelated vectors crowd its bucket. The two
    // parts are disjoint (probe side filtered to vg_a =!= vg_b), so the
    // union introduces no duplicate candidates.
    val interCand = l.join(r, Seq("bkt"))
      .filter(col("vg_a") =!= col("vg_b"))
      .withColumn("score",
        when(col("na") > 0 && col("nb") > 0,
          dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .otherwise(lit(0.0)))
      .select(col("vg_a"), col("vg_b"), col("rb"), col("score"))
    val selfCand = classes.select(
      col("__vg").as("vg_a"), col("__vg").as("vg_b"),
      col("rep_id").as("rb"),
      when(col("nrm") > 0,
        dot(col(vecCol), col(vecCol)) / (col("nrm") * col("nrm")))
        .otherwise(lit(0.0)).as("score"))
    val classCand = interCand.unionByName(selfCand)
    // prune 1: top k+1 candidate classes per query class; rb is the
    // class min member id (rep = min), giving the (score, min-id) order
    val wc = Window.partitionBy(col("vg_a"))
      .orderBy(col("score").desc, col("rb"))
    val topClasses = classCand
      .withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= k + 1)
      .select(col("vg_a"), col("vg_b"), col("score"))
    // prune 2: k+1 smallest member ids per candidate class
    val wm = Window.partitionBy(col("__vg")).orderBy(col(idCol))
    val topMembers = members
      .withColumn("__mr", row_number().over(wm))
      .filter(col("__mr") <= k + 1)
      .select(col("__vg").as("vg_b"), col(idCol).as("nbr_id"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("nbr_id"))
    members.select(col("__vg").as("vg_a"), col(idCol))
      .join(topClasses, Seq("vg_a"))
      .join(topMembers, Seq("vg_b"))
      .filter(col(idCol) =!= col("nbr_id"))
      .select(col(idCol), col("nbr_id"), col("score"))
      .withColumn("nbr_rank", row_number().over(w).cast("long"))
      .filter(col("nbr_rank") <= k)
  }
}
