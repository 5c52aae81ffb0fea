package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch marketing/conversion attribution: assign each conversion's
  * value to the touch events (clicks, views) that preceded it within a
  * lookback window. Linear attribution splits the credit equally across
  * all qualifying touches — the standard complement to the last-touch
  * model, which is already expressible with [[TemporalJoin.asofBackwardTolerant]]
  * (the as-of join picks exactly the latest touch).
  *
  * Reference anchor: the reference engine's join+route stages
  * (`BatchUpdate.py:216-268`) have no temporal credit model; this is a
  * corpus-scale extension in the same family as the funnel/retention
  * operators.
  *
  * Shape at scale: a one-sided banded time join — both sides shuffle
  * ONCE on (key, time-bucket) with bucket width = the lookback, and each
  * touch explodes into exactly TWO buckets (its own and the next), so a
  * touch at time t meets every conversion in [t, t+L] without an O(n²)
  * per-key cross product. The per-conversion touch count is then one
  * window aggregation keyed by the conversion id (a second, narrower
  * exchange carrying only matched pairs). Credit = one IEEE division of
  * the exact integer value by the exact integer count, so results are
  * bit-deterministic across engines. Conversions with no qualifying
  * touch survive with a null touch id and zero `n_touches` — the
  * "direct / unattributed" bucket every attribution report needs.
  */
object Attribution {

  /** Linear (equal-split) attribution of `conversions` value over
    * `touches` within `(conv_ts - lookbackMicros, conv_ts]`.
    *
    * @param conversions one row per conversion; must carry `keyCols`,
    *                    `convIdCol` (globally unique), `convTsUsCol`
    *                    (epoch micros) and `valueCol` (exact integer)
    * @param touches     one row per touch; must carry `keyCols`,
    *                    `touchIdCol` and `touchTsUsCol` (epoch micros)
    * @return one row per (conversion, touch) pair plus one row per
    *         unattributed conversion (null touch columns), with
    *         `n_touches` and `credit` (= value / n_touches, null when
    *         unattributed) appended. */
  def linear(
      conversions: DataFrame,
      touches: DataFrame,
      keyCols: Seq[String],
      convIdCol: String,
      convTsUsCol: String,
      valueCol: String,
      touchIdCol: String,
      touchTsUsCol: String,
      lookbackMicros: Long): DataFrame = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    require(keyCols.nonEmpty, "attribution needs at least one key column")
    val convCols = conversions.columns.toSet
    require(!convCols.contains(touchIdCol) && !convCols.contains(touchTsUsCol),
      "touch id/ts column names must not collide with conversion columns")
    val conv = conversions.withColumn("__cb",
      expr(s"$convTsUsCol div $lookbackMicros"))
    // touches and conversions usually derive from the SAME source frame
    // (one events table filtered two ways), so the touch side's key
    // columns are renamed to private aliases — the join condition then
    // resolves by unique name, immune to self-join lineage ambiguity
    val keyAliases = keyCols.indices.map(i => s"__tk$i")
    val tch = touches.select(
      keyCols.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++
        Seq(col(touchIdCol), col(touchTsUsCol)): _*)
      .withColumn("__tb", explode(array(
        expr(s"$touchTsUsCol div $lookbackMicros"),
        expr(s"$touchTsUsCol div $lookbackMicros") + lit(1L))))
    // a touch at bucket b can precede conversions in buckets b and b+1
    // (bucket width == lookback), never further
    // plain (null-rejecting) key equality, matching the sibling temporal
    // joins and SQL semantics: null-key conversions land in the
    // unattributed bucket rather than cross-matching each other
    val joinCond = keyCols.zip(keyAliases)
      .map { case (k, a) => col(k) === col(a) }
      .reduce(_ && _) &&
      col("__cb") === col("__tb") &&
      col(touchTsUsCol) <= col(convTsUsCol) &&
      col(touchTsUsCol) > col(convTsUsCol) - lit(lookbackMicros)
    val paired = conv.join(tch, joinCond, "left")
      .select(
        keyCols.map(col) ++ Seq(
          col(convIdCol), col(convTsUsCol), col(valueCol),
          col(touchIdCol), col(touchTsUsCol)): _*)
    val w = Window.partitionBy(col(convIdCol))
    paired
      .withColumn("n_touches", count(col(touchIdCol)).over(w))
      .withColumn("credit",
        when(col("n_touches") > 0,
          col(valueCol).cast("double") / col("n_touches").cast("double")))
  }

  /** Position-weighted (U-shaped) attribution is linear attribution with
    * rank-dependent weights; exposed as a Column helper so callers can
    * re-weight [[linear]]'s output without a second join: 40/40/20 with
    * the middle 20% split over interior touches, degenerating to
    * 100 / 50-50 for one / two touches. Weights are exact rationals over
    * a fixed denominator of 100·(n−2) scaled into one IEEE division. */
  def uShapedWeight(rank: Column, nTouches: Column): Column = {
    val interior = (nTouches - lit(2)).cast("double")
    when(nTouches === 1, lit(1.0))
      .when(nTouches === 2, lit(0.5))
      .when(rank === 1 || rank === nTouches, lit(0.4))
      .otherwise(lit(0.2) / interior)
  }
}
