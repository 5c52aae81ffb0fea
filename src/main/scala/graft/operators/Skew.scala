package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm single tasks.
  *
  * First line of defense at runtime is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in our session
  * builders) — it needs no code. Manual salting remains the tool when the
  * skewed side must keep a stable hash partitioning across several stages
  * (AQE's split changes partitioning), or when the engine can't see the
  * skew (e.g. it's introduced by an upstream transform in the same stage).
  *
  * Shape: scatter each skewed-side row into one of `salts` sub-keys;
  * replicate the (small) other side once per salt; join on (key, salt).
  * A hot key's rows now land on `salts` different reducers. Replication
  * multiplies the small side by `salts` — keep it for dimension-sized
  * relations (if the small side fits a broadcast, use `broadcast()`
  * instead; salting is for the mid-size case where neither broadcast nor
  * a plain shuffle works).
  */
object Skew {

  /** Equi-join `skewed ⋈ other` on `keys`, salted `salts` ways. Inner and
    * left-outer (skewed side preserved) semantics match the unsalted join
    * exactly; the salt never leaves the operator. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      "salting replicates the right side; only inner/left joins are safe")
    // row-scoped deterministic-enough scatter; any near-uniform int works
    val scattered = skewed.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = other.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    scattered.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
