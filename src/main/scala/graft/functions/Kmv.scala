package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-cardinality sketch — the mergeable
  * COUNT DISTINCT estimator for rollup dashboards over 100-TB facts
  * (Bar-Yossef et al. 2002; the bottom-k variant HLL superseded in
  * memory but not in REPLAYABILITY). Every element hashes to a uniform
  * point in [0, 1) via md5; a group's sketch is its k smallest distinct
  * hash values. If the group holds fewer than k distinct elements the
  * sketch IS the exact answer; otherwise the k-th smallest value u_k
  * estimates the density and `(k-1) / u_k` the cardinality.
  *
  * Why KMV here rather than HLL: the estimate is a pure deterministic
  * function of md5 — an independent engine replays it bit-for-bit
  * (order the distinct hashes, take the k-th, one IEEE division), which
  * no engine-private HLL register layout offers. And the sketch is a
  * true commutative monoid: merge = union-then-keep-k-smallest, so
  * sub-corpus sketches roll up to exactly the whole-corpus sketch
  * (spec-pinned) — the property that lets per-day sketches answer
  * per-month questions without rescanning anything.
  *
  * Scale shape: the aggregation state is a bounded sorted array (≤ k
  * strings) combined MAP-SIDE like any algebraic aggregate — the corpus
  * shuffles at most k hashes per group per partition, never the
  * elements. No window over the distinct stream, no per-group sort of
  * the full element set.
  */
object Kmv {

  /** The typed aggregator: state = ascending distinct md5-hex values,
    * at most k. Hex strings order exactly like their 128-bit values
    * (fixed-width lowercase hex), so string min-k IS numeric min-k. */
  final class KmvAgg(k: Int)
      extends Aggregator[String, Seq[String], Seq[String]] {
    require(k >= 2, s"KMV needs k >= 2 (the estimate divides by k-1), got $k")
    def zero: Seq[String] = Vector.empty
    def reduce(b: Seq[String], h: String): Seq[String] =
      if (h == null || (b.length == k && b.last <= h)) b
      else insert(b, h)
    def merge(x: Seq[String], y: Seq[String]): Seq[String] =
      y.foldLeft(x)(reduce)
    def finish(r: Seq[String]): Seq[String] = r
    private def insert(b: Seq[String], h: String): Seq[String] = {
      val i = b.search(h)(Ordering.String) match {
        case scala.collection.Searching.Found(_) => return b // dup hash
        case scala.collection.Searching.InsertionPoint(p) => p
      }
      val grown = (b.take(i) :+ h) ++ b.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }
    def bufferEncoder: Encoder[Seq[String]] = Encoders.kryo[Seq[String]]
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** The estimate off a finished sketch column: exact size below k,
    * `(k-1) / u_k` at k, where `u_k` = the k-th smallest hash's first
    * 8 hex digits over 2^32 — one integer extraction and one IEEE
    * division, identical in any engine. */
  def estimate(mins: Column, k: Int): Column = {
    val uk = conv(substring(element_at(mins, k), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) / uk)
  }

  /** Per-group distinct-cardinality estimate of `elemCol`:
    * (group, n_mins, est_distinct). One hash projection, one algebraic
    * aggregation — the elements never shuffle, the ≤ k-entry sketches
    * do. */
  def kmvDistinct(
      df: DataFrame,
      grpCol: String,
      elemCol: String,
      k: Int): DataFrame = {
    val sketch = udaf(new KmvAgg(k), Encoders.STRING)
    df.select(col(grpCol), md5(col(elemCol)).as("__h"))
      .groupBy(col(grpCol))
      .agg(sketch(col("__h")).as("__mins"))
      .select(col(grpCol),
        size(col("__mins")).cast("long").as("n_mins"),
        estimate(col("__mins"), k).as("est_distinct"))
  }
}
