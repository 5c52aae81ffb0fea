package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union ("gaps and islands"): merge a keyed set of possibly
  * overlapping [start, end) intervals into maximal disjoint islands and
  * measure coverage. The operator behind "total watch time from
  * overlapping play spans", "device uptime from heartbeat leases", and
  * session coverage from per-event validity windows.
  *
  * One pass per key: ordered by start (id-tie-broken for determinism),
  * an island opens exactly where a start exceeds the running max of all
  * PRIOR ends — a running max because an early long interval can swallow
  * several later short ones, so the previous row's end alone is wrong.
  * The island id is then a running sum of those open flags, and coverage
  * is a plain groupBy over (key, island). Physical plan: one hash
  * exchange on the key, one sort, two window passes sharing that sort,
  * one partial-aggregated groupBy — no self-join, no state machine;
  * coverage of a 100-TB event log is exactly as parallel as the key
  * cardinality. All arithmetic is exact integer (epoch micros).
  */
object Intervals {

  /** Merge per-key intervals into islands. Input needs integer
    * `startCol`/`endCol` (exclusive end) and a unique `idCol` for
    * deterministic tie order. Returns one row per (key, island):
    * `island` ordinal, `island_start`, `island_end` (max end — the
    * union's extent), `n_intervals`, and `covered` = extent length.
    * Touching intervals (`start == prior end`) CLOSE the gap — half-open
    * semantics — while a 1-unit gap opens a new island. */
  def mergeIslands(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String,
      idCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeIslands needs at least one key column")
    val reserved =
      Seq("__open", "island", "island_start", "island_end", "n_intervals", "covered")
    require(!df.columns.exists(reserved.contains),
      s"input must not already carry ${reserved.mkString("/")} columns")
    val keys = keyCols.map(col)
    val byStart = Window.partitionBy(keys: _*)
      .orderBy(col(startCol), col(idCol))
    val prevEnd = max(col(endCol))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevEnd.isNull || col(startCol) > prevEnd, 1L)
      .otherwise(0L)
    df.withColumn("__open", opens)
      .withColumn("island",
        sum(col("__open")).over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys :+ col("island")): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered", col("island_end") - col("island_start"))
  }
}
