package graft

import graft.operators.Anomaly

/** Median/MAD outlier semantics: robust center, constant-history groups,
  * the minRows floor, and interpolated medians on even counts. */
class AnomalySpec extends SparkSuite {
  import spark.implicits._

  test("madOutliers: constant history flags any deviation; robust to the " +
    "outlier itself") {
    // the 1000 inflates a σ enough to mask itself; the median ignores it
    val df = Seq((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L),
      (1L, 4L, 10L), (1L, 5L, 1000L))
      .toDF("g", "id", "v")
    val got = Anomaly.madOutliers(df, "v", Seq("g"))
      .select($"id", $"med", $"mad", $"dev")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq((5L, 10.0, 0.0, 990.0)))
  }

  test("madOutliers: interpolated even-count median, 3·MAD threshold") {
    // values 1..9 and 100: med = 5.5, MAD = 2.5, 3·MAD = 7.5 → only the
    // 100 (dev 94.5) crosses; the 1 (dev 4.5) does not
    val df = ((1L to 9L) :+ 100L).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }.toDF("g", "id", "v")
    val got = Anomaly.madOutliers(df, "v", Seq("g"), k = 3.0, minRows = 5)
      .select($"v", $"med", $"mad")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((100L, 5.5, 2.5)))
  }

  test("trained thresholds: stream-apply admits exactly the batch flag " +
    "set; unseen groups pass unflagged") {
    val hist = (Seq.fill(6)(10L) :+ 500L).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }.toDF("g", "id", "v")
    val thr = Anomaly.madThresholds(hist, "v", Seq("g"), materialize = false)
    val applied = Anomaly.applyMadThresholds(hist, thr, "v")
      .select($"id").as[Long].collect().toSet
    val batch = Anomaly.madOutliers(hist, "v", Seq("g"))
      .select($"id").as[Long].collect().toSet
    assert(applied == batch && applied == Set(6L))
    // a group absent at training time is not flagged (inner join)
    val fresh = Seq((9L, 99L, 1000000L)).toDF("g", "id", "v")
    assert(Anomaly.applyMadThresholds(fresh, thr, "v").count() == 0L)
  }

  test("madOutliers: groups under the minRows floor are never scored") {
    val df = Seq((1L, 1L, 1L), (1L, 2L, 1000000L), // 2 rows: unscored
      (2L, 3L, 5L), (2L, 4L, 5L), (2L, 5L, 5L), (2L, 6L, 5L), (2L, 7L, 99L))
      .toDF("g", "id", "v")
    val got = Anomaly.madOutliers(df, "v", Seq("g"), minRows = 5)
      .select($"g", $"id").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 7L)))
  }
}
