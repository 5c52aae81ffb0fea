package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching at join scale: all pairs of strings within
  * Levenshtein distance 1, found WITHOUT the quadratic all-pairs scan.
  * The record-linkage primitive behind near-duplicate entity names,
  * typo-tolerant vocabulary merge, and id-mangling detection.
  *
  * Blocking is the SymSpell deletion neighborhood: every string emits
  * its single-character deletions plus itself, and two strings within
  * edit distance 1 PROVABLY share a variant — equal strings share the
  * identity; a substitution at position i means deleting i from both
  * yields the same string; an insertion means the longer side's deletion
  * at the inserted position yields the shorter side itself. The converse
  * does not hold ("ab"/"ba" share variant "a" at distance 2), so shared
  * variants are candidates, verified by one `levenshtein` call per
  * DISTINCT candidate pair. The plan is explode (×(len+1), narrow) →
  * equi-join on the variant → distinct → verify: candidate volume scales
  * with true near-duplicate density, not corpus², and only short strings
  * shuffle. Skew note: a variant shared by v strings yields v² candidate
  * rows — real vocabularies keep v small, but adversarially hot variants
  * (single-char strings) are the AQE-skew-join case, not a broadcast.
  */
object Fuzzy {

  /** The deletion neighborhood of `s`: s itself plus each string formed
    * by deleting one character — `len(s)+1` variants, built from
    * codegen'd `substr`/`concat` (no UDF). */
  def deletionVariants(s: Column): Column =
    array_append(
      // guard the empty string: sequence(0, -1) DESCENDS in Spark, it
      // is not empty
      when(length(s) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), length(s) - 1), i =>
          concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s))))),
      s)

  /** All unordered pairs of DISTINCT values of `strCol` within edit
    * distance ≤ 1. Returns (s1, s2, dist) with s1 < s2.
    *
    * Measured hot-path choices (16.6 → 2.0 s at sf0.1, README):
    * variants are `array_distinct`ed before the explode — a repeated
    * character emits the same deletion once per occurrence ("…000…"
    * names), each duplicate multiplying the candidate fan-out; pair
    * generation is the [[Dedup.minhashCandidates]] bucket shape — ONE
    * shuffle of (variant, string) rows into a groupBy, singleton
    * variants (the vast majority) dropped before any pair forms,
    * in-bucket sorted-prefix expansion — instead of a variant self-join
    * that recomputes the whole explode subtree on both sides; and the
    * verify is the THRESHOLD levenshtein overload (banded O(len·1)
    * early-exit DP, not the O(len²) full matrix), filtered BEFORE the
    * final distinct so its shuffle carries only true pairs. A variant
    * shared by v strings expands v²/2 pairs in one task — the LSH
    * operators cap this observably; here real vocabularies keep v small
    * (≤ 46 on the test corpus), and a cap would silently drop pairs. */
  def fuzzyPairs(df: DataFrame, strCol: String): DataFrame = {
    val strs = df.select(col(strCol).cast("string").as("__s"))
      .filter(col("__s").isNotNull).distinct()
    val pairs = strs
      .select(col("__s"),
        explode(array_distinct(deletionVariants(col("__s")))).as("__var"))
      .groupBy(col("__var"))
      .agg(sort_array(collect_list(col("__s"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(Dedup.sortedPairs(col("ids"), "s1", "s2")).as("p"))
      .select(col("p.s1"), col("p.s2"))
    pairs
      .withColumn("dist", levenshtein(col("s1"), col("s2"), 1).cast("long"))
      .filter(col("dist") >= 0)
      .distinct()
  }
}
