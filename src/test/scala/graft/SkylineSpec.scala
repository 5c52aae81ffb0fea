package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** 2-D skyline: dominance semantics (strict-on-one required), both-equal
  * ties all kept, and bucket-boundary correctness — a frontier must not
  * depend on where bucket edges fall. */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  private def frontierIds(rows: Seq[(Long, Long, Long)], bits: Int) =
    Skyline.frontier2(rows.toDF("id", "cost", "gain"),
      col("cost"), col("gain"), bucketBits = bits)
      .select($"id").as[Long].collect().toSet

  test("dominance: cheaper-and-bigger dominates; strict on one axis needed") {
    val rows = Seq(
      (1L, 10L, 100L), // frontier: cheapest
      (2L, 20L, 90L),  // dominated by nothing? 1 is cheaper AND bigger → dominated
      (3L, 20L, 150L), // frontier: more gain than 1
      (4L, 30L, 150L), // dominated by 3 (same gain, strictly cheaper)
      (5L, 40L, 200L)) // frontier
    assert(frontierIds(rows, bits = 3) == Set(1L, 3L, 5L))
  }

  test("both-equal ties are all kept; equal-cost lower gain drops") {
    val rows = Seq(
      (1L, 10L, 50L), (2L, 10L, 50L), // identical: neither dominates
      (3L, 10L, 40L),                 // equal cost, less gain → dominated
      (4L, 5L, 10L))                  // cheaper, less gain → frontier
    assert(frontierIds(rows, bits = 2) == Set(1L, 2L, 4L))
  }

  test("bucket edges never change the frontier; negation minimizes both") {
    val rows = (0L until 200L).map(i => (i, i * 37 % 1000, i * 61 % 1000))
    val expected = frontierIds(rows, bits = 0) // one row per bucket value
    for (bits <- Seq(2, 5, 9, 20)) // 20: everything lands in one bucket
      assert(frontierIds(rows, bits) == expected, s"bits=$bits")
    // minimize both via negated gain: frontier of (cost, -gain)
    val both = Skyline.frontier2(rows.toDF("id", "cost", "gain"),
      col("cost"), -col("gain"), bucketBits = 4)
      .select($"id").as[Long].collect().toSet
    // brute-force check
    val brute = rows.filter { case (_, c, g) =>
      !rows.exists { case (_, c2, g2) =>
        c2 <= c && g2 <= g && (c2 < c || g2 < g) }
    }.map(_._1).toSet
    assert(both == brute)
  }

  test("reserved-column collision guard") {
    intercept[IllegalArgumentException] {
      Skyline.frontier2(Seq((1L, 2L)).toDF("__bkt", "x"), col("__bkt"), col("x"))
    }
  }
}
