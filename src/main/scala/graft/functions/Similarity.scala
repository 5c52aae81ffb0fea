package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
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

  /** Sign-projection LSH bucket: bit i = sign of component positions(i).
    * Axis-aligned random hyperplanes — deterministic, engine-portable. */
  def signBucket(vec: Column, positions: Seq[Int]): Column =
    positions.zipWithIndex.map { case (p, i) =>
      when(element_at(vec, p) > 0, math.pow(2, i).toInt).otherwise(0)
    }.reduce(_ + _)

  val defaultPositions: Seq[Int] = Seq(1, 17, 33, 49)

  /** Bucketed ANN: probe only the query's sign bucket, then exact cosine
    * within it. */
  def annTopK(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      positions: Seq[Int] = defaultPositions): DataFrame = {
    val qBucket = positions.zipWithIndex
      .map { case (p, i) => if (queryVec(p - 1) > 0) 1 << i else 0 }.sum
    corpus
      .filter(signBucket(col(vecCol), positions) === qBucket)
      .select(col(idCol), cosine(col(vecCol), lit(queryVec.toArray)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs, blocked on an existing
    * low-cardinality key (here: label; at scale: an LSH bucket) so the
    * pairwise stage stays per-block.
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
}
