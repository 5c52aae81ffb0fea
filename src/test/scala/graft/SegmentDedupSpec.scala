package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Segment-level boilerplate removal ([[Dedup.segmentDedup]]): the
  * C4-style line-dedup semantics at fixed word-segment granularity —
  * corpus-wide document frequency decides the drop, reassembly preserves
  * original order, and fully-scrubbed documents stay observable. */
class SegmentDedupSpec extends SparkSuite {
  import spark.implicits._

  private val boiler = "cookie banner notice" // df = 4 > maxDf = 3

  private def fixture = Seq(
    (1L, s"$boiler alpha beta gamma"),
    (2L, s"delta epsilon zeta $boiler tail"),
    (3L, boiler),
    (4L, s"$boiler $boiler"),
    (5L, "shared pair one shared pair one"),
    (6L, ""),
    (7L, "tail word")
  ).toDF("doc_id", "text")

  private def run = Dedup.segmentDedup(fixture, width = 3, maxDf = 3L)
    .orderBy("doc_id")
    .as[(Long, Long, Long, String)]
    .collect()
    .toList

  test("boilerplate segments (df > maxDf) drop everywhere; survivors " +
    "reassemble in original order") {
    assert(run === List(
      (1L, 2L, 1L, "alpha beta gamma"),
      (2L, 3L, 2L, "delta epsilon zeta tail"),
      (3L, 1L, 0L, ""),
      (4L, 2L, 0L, ""),
      (5L, 2L, 2L, "shared pair one shared pair one"),
      (6L, 0L, 0L, ""),
      (7L, 1L, 1L, "tail word")))
  }

  test("within-doc repetition is not boilerplate: df counts DISTINCT " +
    "documents, so doc 5's twice-repeated segment survives while doc 4's " +
    "cross-corpus segment drops both occurrences") {
    val byId = run.map(r => r._1 -> r).toMap
    assert(byId(5L)._3 === 2L)
    assert(byId(4L)._3 === 0L)
  }

  test("segments(): tail shorter than width, empty text, and " +
    "normalization all behave") {
    val segs = Seq(
      ("Alpha, BETA! gamma delta", 1),
      ("", 2),
      ("one two three four five six seven", 3)
    ).toDF("text", "k")
      .select(col("k"), Dedup.segments(col("text"), 3).as("s"))
      .orderBy("k")
      .as[(Int, Seq[String])]
      .collect()
      .toList
    assert(segs === List(
      (1, Seq("alpha beta gamma", "delta")),
      (2, Seq.empty[String]),
      (3, Seq("one two three", "four five six", "seven"))))
  }
}
