package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution and time-series statistics kept engine-exact: equi-width
  * histograms (pure integer bin arithmetic) and time-weighted averages
  * (trapezoidal integration as exact long sums with one terminal IEEE
  * division). Both are one-shuffle shapes: a map-side-combinable groupBy
  * for the histogram, one per-key window pass + groupBy for the TWA.
  */
object Stats {

  /** Per-group equi-width histogram of an integer column, keyed by the
    * bin's [bin_lo, bin_hi) bounds. The bin anchor is `v - pmod(v, w)`
    * — floor-aligned EXACT long arithmetic even for negative values,
    * where SQL's truncating intdiv would round toward zero and Spark's
    * `/` on longs is a double division (silently misbinning past 2^53).
    * One map-side-combinable aggregation; empty bins simply don't
    * appear (densification is a generate-join the caller can add when
    * rendering). */
  def histogram(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val reservedH = Seq("bin_lo", "bin_hi", "n", "v_min", "v_max")
    require(!groupCols.exists(reservedH.contains),
      s"group columns must not collide with ${reservedH.mkString("/")}")
    val v = col(valueCol).cast("long")
    val binLo = v - pmod(v, lit(width))
    val keys = (groupCols.map(col) :+ binLo.as("bin_lo"))
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        min(v).as("v_min"), max(v).as("v_max"))
      .withColumn("bin_hi", col("bin_lo") + width)
  }

  /** Contingency-table independence diagnostics, per CELL: for each
    * (rowCol, colCol) value pair, the observed count, the
    * independence-expected count `row_total·col_total / n`, and the
    * cell's χ² contribution `(o − e)² / e`. Emitting per-cell numbers
    * rather than one summed statistic keeps every value engine-exact —
    * a χ² total is a float SUM whose value depends on addition order,
    * while each cell is exact-long products with a fixed IEEE
    * division/subtract/square/divide chain — and tells the analyst
    * WHICH cells drive the dependence. (Callers wanting the scalar
    * sum the column and accept last-ulp drift.) Plan: one cell count
    * (map-side combinable), two category-sized marginal aggregations
    * joined back (AQE-sized, no hints — category cardinality is
    * unbounded), one broadcast one-row total. */
  def chiSquareCells(
      df: DataFrame,
      rowCol: String,
      colCol: String): DataFrame = {
    val reservedC =
      Seq("observed", "row_total", "col_total", "n", "expected", "contribution")
    require(!Seq(rowCol, colCol).exists(reservedC.contains),
      s"dimension columns must not collide with ${reservedC.mkString("/")}")
    val cells = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy(col(rowCol))
      .agg(sum(col("observed")).as("row_total"))
    val colTot = cells.groupBy(col(colCol))
      .agg(sum(col("observed")).as("col_total"))
    val n = cells.select(sum(col("observed")).as("n"))
    val e = (col("row_total") * col("col_total")).cast("double") / col("n")
    cells.join(rowTot, Seq(rowCol)).join(colTot, Seq(colCol))
      .join(broadcast(n))
      .select(col(rowCol), col(colCol), col("observed"),
        col("row_total"), col("col_total"), col("n"),
        e.as("expected"),
        (((col("observed") - e) * (col("observed") - e)) / e)
          .as("contribution"))
  }

  /** Tukey-fence winsorization per group: values clipped to
    * [q1 − k·IQR, q3 + k·IQR], the textbook robust outlier boundary.
    * Exactness: over integer inputs, quartiles interpolate at dyadic
    * fractions (quarters), so q1/q3 — and with dyadic `k` (1.5 default)
    * the fences — are exact doubles, identical on any engine regardless
    * of which algebraic form its interpolation uses. A [0.05, 0.95]
    * clip would NOT be: 0.05·(b−a) vs (1−0.95)·… round differently in
    * the last ulp across engines. Two-pass: one percentile aggregation
    * per group (same shape as [[Anomaly.madThresholds]]), one join
    * back, clip with greatest/least. */
  def tukeyClip(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 1.5): DataFrame = {
    require(groupCols.nonEmpty, "tukeyClip needs at least one group column")
    require(k >= 0, "k must be non-negative")
    val reserved = Seq("q1", "q3", "lo", "hi", "clipped")
    require(!df.columns.exists(reserved.contains),
      s"input must not already carry ${reserved.mkString("/")} columns")
    val gc = groupCols.map(col)
    val q = df.groupBy(gc: _*)
      .agg(percentile(col(valueCol), lit(0.25)).as("q1"),
        percentile(col(valueCol), lit(0.75)).as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * k)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * k)
    df.join(q, groupCols)
      .withColumn("clipped",
        greatest(least(col(valueCol).cast("double"), col("hi")), col("lo")))
  }

  /** Per-group EQUI-DEPTH histogram: `buckets` tiles of (near-)equal
    * row count per group, each with its count and value extent — the
    * distribution summary that stays informative under skew, where
    * [[histogram]]'s equi-width bins collapse into one hot bin. Tile
    * layout is `ntile`'s over the totally ordered values — the first
    * `n mod k` tiles get the extra row — which both engines define
    * identically, so counts AND extents are engine-exact.
    *
    * Plan shape: NOT `ntile().over(partitionBy(group))` — a per-row
    * window over the bare group key is one sort task per hot group at
    * 100 TB. The tile layout is pure rank arithmetic, so everything
    * derives from the count-by-value frame: a distinct value's ranks
    * span `[cum−cnt+1, cum]`, the tile of a 1-based rank is closed-form
    * in (n div k, n mod k), each value explodes to the tiles its span
    * intersects (≤ distinct-values + k rows per group in total), and a
    * map-side-combinable min/max per (group, tile) yields the extents —
    * the minimum intersecting value necessarily contains the tile's
    * first rank, so extents equal the row-window formulation's exactly.
    * Tile COUNTS are closed-form, not counted. `idCol` is retained for
    * signature stability; rank arithmetic no longer needs a tiebreak
    * because extents depend only on the value ordering. */
  def equiDepthHistogram(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      buckets: Int,
      idCol: String): DataFrame = {
    require(groupCols.nonEmpty, "equiDepthHistogram needs a group column")
    require(buckets >= 1, "buckets must be positive")
    val reservedE = Seq("tile", "n", "v_min", "v_max")
    require(!groupCols.exists(reservedE.contains),
      s"group columns must not collide with ${reservedE.mkString("/")}")
    val gc = groupCols.map(col)
    val byV = Window.partitionBy(gc: _*).orderBy(col(valueCol))
    val grp = Window.partitionBy(gc: _*)
    def tileOf(rank: String): org.apache.spark.sql.Column = expr(
      s"CASE WHEN $rank <= __r * (__q + 1) " +
        s"THEN ($rank - 1) div (__q + 1) + 1 " +
        s"ELSE __r + ($rank - __r * (__q + 1) - 1) div __q + 1 END")
    df.groupBy((gc :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(byV))
      .withColumn("__n", sum(col("__cnt")).over(grp))
      .withColumn("__lo", col("__cum") - col("__cnt") + 1L)
      .withColumn("__q", expr(s"__n div ${buckets}L"))
      .withColumn("__r", expr(s"__n % ${buckets}L"))
      .withColumn("tile",
        explode(sequence(tileOf("__lo"), tileOf("__cum"))))
      .groupBy((gc :+ col("tile")): _*)
      .agg(min(col("__q")).as("__q"), min(col("__r")).as("__r"),
        min(col(valueCol)).as("v_min"), max(col(valueCol)).as("v_max"))
      .select((gc :+ col("tile")) ++ Seq(
        when(col("tile") <= col("__r"), col("__q") + 1L)
          .otherwise(col("__q")).as("n"),
        col("v_min"), col("v_max")): _*)
  }

  /** Per-group CDF (quantile-transform) normalization: every row gets
    * its `rank` and `pct` = percent_rank = (rank − 1)/(n − 1) within
    * its group's value ordering — the rank-based feature normalization
    * that is robust to outliers where min-max scaling is not. Exactness:
    * ranks are integers (ties SHARE a rank, so no tie-order
    * nondeterminism), and pct is one IEEE division of exact integers —
    * identical on any engine FOR NON-NULL values: engines disagree on
    * null sort order, and here a null value drops its row entirely
    * (the rank join below, like SQL equality, never matches null) —
    * filter or impute nulls before calling. Single-row groups get
    * pct 0.
    *
    * Plan shape is the 100-TB-safe one `ev_median_mad` established: a
    * `rank().over(partitionBy(group))` would funnel every row of a
    * hot group into ONE sort task, so the ranks are computed on the
    * count-by-value frame instead — shared rank of value v is
    * `cum(v) − cnt(v) + 1` over the per-group DISTINCT-VALUE window
    * (orders of magnitude smaller than rows for integral domains) —
    * and joined back on (group, value). The raw frame never
    * window-sorts; with a small value domain the rank table
    * broadcasts (AQE sizing), so the data side often does not even
    * shuffle. Output rows and values are identical to the window
    * formulation (ties share the rank by construction). */
  def cdfNormalize(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "cdfNormalize needs at least one group column")
    val reserved = Seq("rank", "pct")
    require(!df.columns.exists(reserved.contains),
      s"input must not already carry ${reserved.mkString("/")} columns")
    val gc = groupCols.map(col)
    val byV = Window.partitionBy(gc: _*).orderBy(col(valueCol))
    val grp = Window.partitionBy(gc: _*)
    val ranks = df.groupBy((gc :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(byV))
      .withColumn("__n", sum(col("__cnt")).over(grp))
      .select((gc :+ col(valueCol)) ++ Seq(
        (col("__cum") - col("__cnt") + 1L).as("rank"),
        when(col("__n") > 1L,
          (col("__cum") - col("__cnt")).cast("double") /
            (col("__n") - 1L).cast("double"))
          .otherwise(lit(0.0)).as("pct")): _*)
    df.join(ranks, groupCols :+ valueCol)
      .select(df.columns.map(col) ++ Seq(col("rank"), col("pct")): _*)
  }

  /** Declarative data-quality expectations, ONE scan for all of them:
    * each rule is a (name, violation-predicate) pair, aggregated as
    * conditional counts in a single pass (null predicates — e.g. a
    * range check on a null value — count as non-violations, matching
    * SQL `WHERE`), then the one summary row unpivots to a
    * (rule, n_rows, n_violations) report frame. The
    * expectation-suite shape every ingest pipeline gates on; a
    * per-rule pass would scan the corpus r times. Key-uniqueness is
    * not a row predicate — [[expectUniqueKey]] covers it. */
  def expectRows(
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "expectRows needs at least one rule")
    // coalesce: a global agg over an EMPTY frame yields null sums, and
    // an ingest gate must read 0 violations there, not null (the
    // oracle's scalar COUNT subqueries yield 0)
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, v), i) =>
        coalesce(sum(when(v, 1L).otherwise(0L)), lit(0L)).as(s"__v$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("rule"), col("__n").as("n_rows"),
          col(s"__v$i").as("n_violations"))
      }: _*)).as("e"))
      .select(col("e.rule"), col("e.n_rows"), col("e.n_violations"))
  }

  /** The referential-integrity expectation: child rows whose key has
    * no match in the parent count as violations — the cross-table
    * check [[expectRows]]' single-scan predicates cannot express. SQL
    * FK semantics: a child key containing any NULL passes (it asserts
    * nothing), matching `NOT IN`-with-non-null-guard on the oracle
    * side. Shape at scale: the child projects to its key columns and
    * anti-joins the parent's distinct keys — the only bytes shuffled
    * are keys, and a dimension-sized parent broadcasts under AQE;
    * report is one (rule, n_rows, n_violations) row, shape-compatible
    * with [[expectRows]] for suite unions. */
  def expectForeignKey(
      child: DataFrame,
      parent: DataFrame,
      childKeys: Seq[String],
      parentKeys: Seq[String],
      name: String = "foreign_key"): DataFrame = {
    require(childKeys.nonEmpty, "expectForeignKey needs key columns")
    require(childKeys.length == parentKeys.length,
      s"child keys ${childKeys.mkString(",")} and parent keys " +
        s"${parentKeys.mkString(",")} must align")
    val keyed = child.select(childKeys.map(col): _*)
    val violations = keyed
      .filter(childKeys.map(col(_).isNotNull).reduce(_ && _))
      .join(parent.select(parentKeys.map(col): _*).distinct()
        .toDF(childKeys: _*), childKeys, "left_anti")
    keyed.agg(count(lit(1)).as("n_rows"))
      .crossJoin(violations.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))
  }

  /** The uniqueness expectation: rows whose key appears more than once
    * all count as violations. One map-side-combinable groupBy on the
    * key, one tiny re-aggregation — shape-compatible with
    * [[expectRows]]' report frame (union them for the full suite). */
  def expectUniqueKey(
      df: DataFrame,
      keyCols: Seq[String],
      name: String = "unique_key"): DataFrame = {
    require(keyCols.nonEmpty, "expectUniqueKey needs at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)), lit(0L))
          .as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))
  }

  /** One-pass numeric column profile: for each requested column, five
    * deterministic metrics — n_rows, n_nulls, n_distinct (exact),
    * min, max (cast to double; exact for the integer-cents columns
    * this suite profiles) — computed in a SINGLE aggregate over the
    * frame and unpivoted to (col_name, metric, value) rows, the
    * [[expectRows]] one-scan contract. No sums of floats (order-
    * dependent) and no sketches — every number replays bit-for-bit on
    * any engine. */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    val aggs = count(lit(1)).cast("double").as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .cast("double").as(s"__nul_$i"),
        countDistinct(col(c)).cast("double").as(s"__dst_$i"),
        min(col(c)).cast("double").as(s"__min_$i"),
        max(col(c)).cast("double").as(s"__max_$i"))
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zipWithIndex.flatMap { case (c, i) =>
        Seq("n_rows" -> col("__n"), "n_nulls" -> col(s"__nul_$i"),
          "n_distinct" -> col(s"__dst_$i"), "min" -> col(s"__min_$i"),
          "max" -> col(s"__max_$i")).map { case (m, v) =>
          struct(lit(c).as("col_name"), lit(m).as("metric"),
            v.as("value"))
        }
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.metric"), col("p.value"))
  }

  /** Per-GROUP ingest profile of one value column — and deliberately a
    * single declarative aggregation so the SAME operator runs over a
    * STREAMING frame in Complete mode (the at-ingest drift gate):
    * n_rows / n_nulls / min / max are algebraic, and distinct
    * cardinality rides [[graft.functions.Kmv]]'s bottom-k sketch
    * (n_mins, est_distinct over the non-null values) because exact
    * count(DISTINCT) is structurally unsupported over streams — the
    * sketch is the operator that CAN run there, and its merge-tree
    * independence (property-pinned) is exactly why micro-batch
    * absorption equals the batch answer bit-for-bit. */
  def profileByGroup(
      df: DataFrame,
      grpCol: String,
      valCol: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.Encoders
    val sketch = udaf(new graft.functions.Kmv.KmvAgg(k), Encoders.STRING)
    df.select(col(grpCol), col(valCol),
        md5(col(valCol).cast("string")).as("__h"))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col(valCol).isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_nulls"),
        min(col(valCol)).as("min_v"),
        max(col(valCol)).as("max_v"),
        sketch(col("__h")).as("__mins"))
      .select(col(grpCol), col("n_rows"), col("n_nulls"),
        col("min_v"), col("max_v"),
        size(col("__mins")).cast("long").as("n_mins"),
        graft.functions.Kmv.estimate(col("__mins"), k).as("est_distinct"))
  }

  /** Distribution-drift report between two faces of a table (two
    * snapshot versions via `Snapshots.readAsOf`, yesterday's load vs
    * today's, raw vs corrected): [[profileNumeric]] on each side,
    * joined per (column, metric), with the delta attached — the ingest
    * monitor that catches "the correction nulled a third of
    * value_cents" or "user_id cardinality halved" from two metadata-
    * cheap aggregate passes, before any consumer reads the bad face.
    * Null metrics (min/max of an all-null column) propagate as null
    * old/new/delta rather than masquerading as zero. */
  def profileDrift(
      oldDf: DataFrame,
      newDf: DataFrame,
      cols: Seq[String]): DataFrame =
    profileNumeric(oldDf, cols)
      .withColumnRenamed("value", "old_value")
      .join(profileNumeric(newDf, cols)
        .withColumnRenamed("value", "new_value"),
        Seq("col_name", "metric"))
      .withColumn("delta", col("new_value") - col("old_value"))

  /** Per-key time-weighted average by trapezoidal integration over the
    * (ts, value) series: Σ (vᵢ + vᵢ₊₁)·Δtᵢ / (2·ΣΔtᵢ). Both sums are
    * exact longs (order-independent), so the single closing division is
    * the only float op — bit-identical on any engine and any partition
    * order. Keys whose series spans zero time (one point, or every
    * point at the same timestamp) yield a null `twa` — there is no
    * interval to integrate over.
    * Callers pre-scale: integer values (cents) and integer timestamps
    * coarse enough that `max|v|·Σ Δt` stays inside a long — e.g. cents
    * against SECONDS for year-scale windows, not micros. */
  def timeWeightedAvg(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      idCol: String): DataFrame = {
    require(keyCols.nonEmpty, "timeWeightedAvg needs at least one key column")
    val reservedT = Seq("__dt", "__vs", "n_segments", "num", "den", "twa")
    require(!df.columns.exists(reservedT.contains),
      s"input must not already carry ${reservedT.mkString("/")} columns")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(idCol))
    val dt = col(tsCol).cast("long") - lag(col(tsCol).cast("long"), 1).over(w)
    val vsum = col(valueCol).cast("long") + lag(col(valueCol).cast("long"), 1).over(w)
    df.withColumn("__dt", dt).withColumn("__vs", vsum)
      .groupBy(keys: _*)
      .agg(count(col("__dt")).as("n_segments"),
        sum(col("__vs") * col("__dt")).as("num"),
        (sum(col("__dt")) * 2L).as("den"))
      .withColumn("twa",
        when(col("den") > 0, col("num").cast("double") / col("den")))
  }

  /** Exact-integer two-sample Kolmogorov–Smirnov distance per key —
    * the distribution-shift alarm for a data pipeline ("did this
    * week's purchase sizes drift from last week's"), with zero
    * floating point: instead of `max |F_a(x) − F_b(x)|` over IEEE
    * ECDFs, the cross-multiplied `ks_scaled = max |cumA·n_b − cumB·n_a|`
    * over integer counts — the same argmax, bit-identical across
    * engines (divide by `n_a·n_b` yourself for the textbook statistic).
    *
    * Shape at scale: count-by-value FIRST (one map-side-combinable
    * aggregation), then the cumulative window ranks the per-key value
    * DOMAIN, never the row stream — the `ev_median_mad` lesson; a
    * per-key reducer holds distinct values, not rows. `sideCol` must
    * be 0/1. Output: (keys…, n_a, n_b, ks_scaled). Callers keep
    * `max(cum)·max(n)` inside a long — counts up to ~3·10⁹ rows per
    * side are safe. */
  def ksScaled(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      sideCol: String): DataFrame = {
    require(keyCols.nonEmpty, "ksScaled needs at least one key column")
    val keys = keyCols.map(col)
    val counts = df.groupBy((keys :+ col(valueCol)): _*)
      .agg(sum(when(col(sideCol) === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(sideCol) === 1, 1L).otherwise(0L)).as("__cb"))
    ksScaledFromCounts(counts, keyCols, valueCol, "__ca", "__cb")
  }

  /** [[ksScaled]]'s finishing half over an already-built count-by-value
    * frame — the algebraic seam its streaming twin splits at: a
    * Complete-mode per-(key, value, side) count is exactly the state a
    * stream can maintain (domain-sized, map-side-combined), and this
    * window pass over the drained counts is the batch finish. */
  def ksScaledFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      caCol: String,
      cbCol: String): DataFrame = {
    require(keyCols.nonEmpty, "ksScaledFromCounts needs a key column")
    val keys = keyCols.map(col)
    val byVal = Window.partitionBy(keys: _*).orderBy(col(valueCol))
    val full = Window.partitionBy(keys: _*)
    counts
      .withColumn("__cum_a", sum(col(caCol))
        .over(byVal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__cum_b", sum(col(cbCol))
        .over(byVal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__na", sum(col(caCol)).over(full))
      .withColumn("__nb", sum(col(cbCol)).over(full))
      .groupBy(keys: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs(col("__cum_a") * col("__nb") -
          col("__cum_b") * col("__na"))).as("ks_scaled"))
  }
}
