package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.Dedup
import graft.streaming.PhashStream

/** Online image dedup contracts: arrival order beats id across batches,
  * min id claims within a batch, and a chunk collision WITHOUT hash
  * proximity never loses — the exact-verify step that separates the
  * image path from MinHash banding. */
class PhashStreamSpec extends SparkSuite {
  import spark.implicits._

  private val H = 0x123456789ABCDEF0L

  private var runIdx = 0
  private def run(batches: Seq[Seq[(Long, Long)]]): Set[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    runIdx += 1
    val sink = s"phash_stream_test_$runIdx"
    val stream = MemoryStream[(Long, Long)]
    val losses = PhashStream.onlineImageDedupStream(
      Dedup.hammingChunkKeys(
        stream.toDS().toDF("asset_id", "phash"),
        "asset_id", "phash", bits = 64, maxDist = 3))
    val query = losses.toDF().writeStream.format("memory")
      .queryName(sink).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
      spark.table(sink).select($"asset_id", $"won_by")
        .as[(Long, Long)].collect().toSet
    } finally query.stop()
  }

  test("across batches arrival order wins (a smaller late id loses); " +
    "within a batch the min id claims; chunk collisions need proximity") {
    // C shares A's LOW chunk (bits 0..15) but differs in 20 high bits —
    // a bucket collision with hamming 20, which must NOT lose
    val far = H ^ 0x000FFFFF00000000L
    assert(java.lang.Long.bitCount(H ^ far) == 20)
    val out = run(Seq(
      Seq((10L, H)),            // A claims all four chunks
      Seq((5L, H ^ 1L),         // dist 1 to A — loses DESPITE smaller id
        (99L, far))))           // collision only — survives
    assert(out == Set((5L, 10L)))

    // one batch: min id claims, near neighbor loses, far sharer doesn't
    val one = run(Seq(Seq((7L, H), (9L, H ^ 2L), (42L, far))))
    assert(one == Set((9L, 7L)))
  }

  test("single-batch replay equals the min-id-claims oracle semantics") {
    // ids 1..40 in one batch over 4 hash classes (pairwise-far bases,
    // small within-class jitter). A loss row exists per claimed bucket
    // whose claimer is within dist 3 — an image can lose to DIFFERENT
    // claimers via different chunks (a jittered chunk's bucket belongs
    // to the min id with that exact chunk value, not the class min), so
    // the ground truth is computed from the protocol, not assumed.
    val bases = Seq(H, ~H, 0x0F0F0F0F0F0F0F0FL, 0x00FF00FF00FF00FFL)
    val rows = (1L to 40L).map(i =>
      (i, bases(((i - 1) % 4).toInt) ^ (if (i > 4) 1L << (i % 3) else 0L)))
    val out = run(Seq(rows))
    val byId = rows.toMap
    val expected = (for {
      ci <- 0 until 4
      (_, sharers) <- rows.groupBy { case (_, h) => (h >> (ci * 16)) & 0xFFFFL }
      winner = sharers.map(_._1).min
      (id, h) <- sharers
      if id != winner && java.lang.Long.bitCount(h ^ byId(winner)) <= 3
    } yield (id, winner)).toSet
    assert(out == expected)
    // and the distinct-loser verdict (the gate's shape) matches too
    assert(out.map(_._1) == expected.map(_._1))
  }
}
