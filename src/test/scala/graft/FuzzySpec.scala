package graft

import graft.functions.Fuzzy
import org.apache.spark.sql.functions._

/** Deletion-variant blocking: the neighborhood contents, the no-miss
  * guarantee across all three edit kinds, and the false-candidate
  * verify step. */
class FuzzySpec extends SparkSuite {
  import spark.implicits._

  test("deletionVariants: each single-char deletion plus the identity") {
    val got = Seq("abc").toDF("s")
      .select(Fuzzy.deletionVariants($"s")).as[Seq[String]].head()
    assert(got == Seq("bc", "ac", "ab", "abc"))
    val empty = Seq("").toDF("s")
      .select(Fuzzy.deletionVariants($"s")).as[Seq[String]].head()
    assert(empty == Seq(""))
  }

  test("fuzzyPairs: substitution, insertion, deletion all found; " +
    "shared-variant false candidates are verified away") {
    val toks = Seq("cat", "bat", // substitution
      "cart", "cat", // insertion (vs cat), duplicate collapses
      "at", // deletion of c
      "ab", "ba", // distance 2 but share variants 'a' and 'b' — must drop
      "zzz") // isolated
      .toDF("tok")
    val got = Fuzzy.fuzzyPairs(toks, "tok")
      .select($"s1", $"s2", $"dist")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("bat", "cat", 1L),
      ("at", "bat", 1L), ("at", "cat", 1L),
      ("cart", "cat", 1L),
      ("ab", "at", 1L),  // substitution b→t
      ("ba", "bat", 1L))) // insertion of t
  }

  test("null strings drop; distance-0 pairs cannot exist after distinct") {
    val toks = Seq(Some("x"), None, Some("x")).toDF("tok")
    assert(Fuzzy.fuzzyPairs(toks, "tok").count() == 0L)
  }
}
