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

  test("seasonalResiduals: exact scaled-integer cell means, residuals " +
    "sum to n*value - n*mean per cell, cardinality preserved") {
    import java.sql.Timestamp
    // two events in the same (type, dow, hr) cell, one alone elsewhere
    val t0 = Timestamp.valueOf("2024-01-07 15:10:00") // a Sunday, hr 15
    val t1 = Timestamp.valueOf("2024-01-07 15:40:00") // same cell
    val t2 = Timestamp.valueOf("2024-01-08 09:05:00") // Monday, hr 9
    val ev = Seq(
      (1L, "a", t0, 10L), (2L, "a", t1, 25L), (3L, "a", t2, 7L))
      .toDF("event_id", "event_type", "ts", "cents")
    val out = graft.operators.Anomaly
      .seasonalResiduals(ev, "ts", "cents", Seq("event_type"))
      .orderBy($"event_id")
      .select($"event_id", $"dow", $"hr", $"n_cell", $"mean_milli",
        $"residual_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // cell (a, Sun=0, 15): mean_milli = 35000 DIV 2 = 17500
    assert(out == Seq(
      (1L, 0L, 15L, 2L, 17500L, 10000L - 17500L),
      (2L, 0L, 15L, 2L, 17500L, 25000L - 17500L),
      (3L, 1L, 9L, 1L, 7000L, 0L)))
  }
}
