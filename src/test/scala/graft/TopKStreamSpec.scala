package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{TopKIn, TopKOut}

/** Streaming leaderboard: bounded-k eviction across micro-batches,
  * monotone version tags, untouched keys stay silent. */
class TopKStreamSpec extends SparkSuite {
  import spark.implicits._

  test("top-k merges across batches, evicts losers, versions per key") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TopKIn]
    val out = Sessionize.topKStream(stream.toDS(), k = 2)
    val query = out.writeStream.format("memory")
      .queryName("topk_test").outputMode(OutputMode.Update).start()
    try {
      // batch 1: user 1 gets 10, 30; user 2 gets 5
      stream.addData(TopKIn(1L, 101L, 10L), TopKIn(1L, 102L, 30L),
        TopKIn(2L, 201L, 5L))
      query.processAllAvailable()
      // batch 2: user 1 gets 20 — evicts 10; user 2 untouched (no emit)
      stream.addData(TopKIn(1L, 103L, 20L))
      query.processAllAvailable()
      val rows = spark.table("topk_test").as[TopKOut].collect().toSeq
      // final board per key = max-version rows
      val fin = rows.groupBy(_.user_id).map { case (u, rs) =>
        val mv = rs.map(_.version).max
        u -> rs.filter(_.version == mv).sortBy(_.rank)
          .map(r => (r.rank, r.event_id, r.cents))
      }
      assert(fin(1L) == Seq((1L, 102L, 30L), (2L, 103L, 20L))) // 10 evicted
      assert(fin(2L) == Seq((1L, 201L, 5L)))
      // user 1 saw two batches (v1, v2); user 2 only one — no re-emit
      assert(rows.filter(_.user_id == 1L).map(_.version).toSet == Set(1L, 2L))
      assert(rows.filter(_.user_id == 2L).map(_.version).toSet == Set(1L))
      // tie-break: equal cents rank by lower id
      stream.addData(TopKIn(3L, 301L, 7L), TopKIn(3L, 300L, 7L))
      query.processAllAvailable()
      val u3 = spark.table("topk_test").as[TopKOut].collect()
        .filter(_.user_id == 3L).sortBy(_.rank).map(_.event_id).toSeq
      assert(u3 == Seq(300L, 301L))
      // at-least-once delivery: a re-delivered board row must not eat a
      // slot — user 4's k=2 board keeps its genuine runner-up
      stream.addData(TopKIn(4L, 401L, 50L), TopKIn(4L, 402L, 40L))
      query.processAllAvailable()
      stream.addData(TopKIn(4L, 401L, 50L)) // duplicate of the leader
      query.processAllAvailable()
      val u4rows = spark.table("topk_test").as[TopKOut].collect()
        .filter(_.user_id == 4L)
      val u4 = u4rows.filter(_.version == u4rows.map(_.version).max)
        .sortBy(_.rank).map(r => (r.rank, r.event_id, r.cents)).toSeq
      assert(u4 == Seq((1L, 401L, 50L), (2L, 402L, 40L)))
    } finally query.stop()
  }
}
