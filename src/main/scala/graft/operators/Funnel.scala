package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-step funnel analysis: for each user, the earliest time each step of
  * an ordered event sequence completes, where step i must happen STRICTLY
  * AFTER the user's step i−1 time ("signup, then a click after it, then a
  * purchase after that"). The product-analytics staple for conversion
  * measurement.
  *
  * Shape chosen for scale: one pass per step — a map-side-combinable
  * conditional `min` per user joined back to the (narrow) per-user state —
  * instead of per-user event sorting or a sequential scan. Each round
  * shuffles only (user, ts) pairs for ONE event type plus the k-column
  * state frame; with s steps that is s keyed aggregations, all on the
  * same user key. The per-round state is [[graft.functions.Materialize]]d
  * (the connected-components/LPA iterative pattern): step i's plan
  * consumes the state TWICE (the strictly-after filter and the left
  * join), and without truncation Catalyst re-derives the whole step
  * prefix for each consumer — a 3-step funnel re-scanned events SEVEN
  * times and re-ran the step-1 aggregation four times; the cost grows
  * quadratically in step count, which is fatal at 100 TB. Materialized,
  * every step scans events exactly once and reads the (per-user-small)
  * prior state from checkpoint blocks. A user's row carries nulls from
  * the first uncompleted step onward (left joins), and `funnel_depth`
  * counts completed steps — conversion-rate reporting is one groupBy
  * over it.
  */
object Funnel {

  /** @param steps   ordered event types, e.g. Seq("signup","click","purchase")
    * @return one row per user that completed step 1, with `t1..ts` (step
    *         completion timestamps, null once the funnel stalls) and
    *         `funnel_depth`. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // step 1: unconditional earliest occurrence. Materialized: every
    // later round joins against it (directly or through its successors)
    val first = graft.functions.Materialize(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("t1")))
    // step i: earliest occurrence strictly after the user's t(i-1).
    // Each round's output is materialized before the next consumes it
    // twice (filter + left join) — see the class doc for why
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (state, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        val next = events.filter(col(typeCol) === step)
          .join(state.select(col(userCol), col(prev)), Seq(userCol))
          .filter(col(tsCol) > col(prev))
          .groupBy(col(userCol))
          .agg(min(col(tsCol)).as(cur))
        graft.functions.Materialize(state.join(next, Seq(userCol), "left"))
    }
    val depth = steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    full.withColumn("funnel_depth", depth.cast("long"))
  }

  /** Cohort retention matrix: users cohorted by the DAY of their first
    * `anchorType` event, counted as active in each WEEK offset from it —
    * the (cohort, week) → distinct-users grid behind every retention
    * curve. Day/week arithmetic is pure integer division on epoch
    * micros (`div 86400000000`, then the day delta `div 7`) — no
    * calendar/timezone truncation, so the bucketing is identical in any
    * engine. Activity counts from the anchor onward (`ts >= t0`); one
    * anchor aggregation, one join on the user key, one
    * map-side-combinable distinct count. Output: (cohort_day,
    * week_offset, n_users). */
  def retention(
      events: DataFrame,
      anchorType: String = "signup",
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val anchors = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t0"))
    events.select(col(userCol), col(tsCol))
      .join(anchors, Seq(userCol))
      .filter(col(tsCol) >= col("__t0"))
      .select(col(userCol),
        expr("unix_micros(__t0) div 86400000000").as("cohort_day"),
        expr(s"(unix_micros($tsCol) div 86400000000" +
          " - unix_micros(__t0) div 86400000000) div 7").as("week_offset"))
      .groupBy(col("cohort_day"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Event-type transition matrix: counts of consecutive (previous →
    * next) event-type pairs per user timeline — the first-order Markov
    * model behind Sankey/flow diagrams, "what do users do after X"
    * analyses, and anomalous-sequence detection. Each user's first event
    * appears as a transition from the `"∅"` start sentinel, so row sums
    * over `prev` reconcile with per-type event counts.
    *
    * One window (lag over the user timeline, tie-broken on the id column
    * so the order — and therefore every count — is deterministic under
    * equal timestamps) plus one map-side-combinable count. The window
    * shuffles (user, ts, type) triples once; the transition matrix
    * itself is |types|² rows, tiny by construction. */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id",
      startSentinel: String = "∅"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("prev",
        coalesce(lag(col(typeCol), 1).over(w), lit(startSentinel)))
      .groupBy(col("prev"), col(typeCol).as("next"))
      .agg(count(lit(1)).as("n"))
  }

  /** Top-k most common length-`len` event-type PATHS across user
    * timelines — the funnel-DISCOVERY aggregate a first-order
    * [[transitions]] matrix cannot give: the matrix says view→cart is
    * common, the path count says `view>cart>purchase` specifically
    * beats `view>cart>view`. One window with `len−1` leads (tie-broken
    * on `idCol`, so paths are deterministic under reruns), windows
    * truncated at timeline ends (no partial paths), then a map-side-
    * combinable path count. The closing rank is a single-partition
    * window — sound because its input is the PATH DOMAIN (≤ |types|^len
    * rows, dozens at any corpus scale), never the event stream; the
    * same justification as the one-row-total crossJoins. Ties rank by
    * path text. Output: (path, n, rank), rank ≤ k. */
  def topPaths(
      events: DataFrame,
      len: Int = 3,
      k: Int = 10,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(len >= 2, s"a path needs at least 2 steps, got $len")
    require(k >= 1, s"top-k needs k >= 1, got $k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val steps = (1 until len).map(i => lead(col(typeCol), i).over(w))
    events
      .select(col(typeCol), steps.last.as("__last"),
        concat_ws(">", (col(typeCol) +: steps): _*).as("path"))
      .filter(col("__last").isNotNull)
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n").desc, col("path"))).cast("long"))
      .filter(col("rank") <= k)
  }
}
