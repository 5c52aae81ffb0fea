package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming online perceptual-image dedup — the image-side twin of
  * [[StreamDedup]]: every incoming image's pigeonhole hash chunks
  * ([[graft.functions.Dedup.hammingChunkKeys]] over its 64-bit dHash)
  * claim their (chunk, value) buckets first-writer-wins, and a later
  * image that lands in a claimed bucket is emitted as a LOSER **iff its
  * full hash is within `maxDist` of the claimer's** — the exact-verify
  * step text MinHash banding doesn't need (band equality there already
  * implies similarity; a 16-bit chunk collision here does not). Append
  * mode, no watermark: a verdict completes within the image's own
  * micro-batch.
  *
  * Contract mirrors [[StreamDedup]]: ACROSS batches arrival order wins;
  * WITHIN a batch the min id claims. Replaying the corpus as one batch
  * therefore reduces to min-id-claims-the-bucket, which is what the
  * shared oracle recomputes. State per (chunk, value) bucket is the
  * winning (id, hash) — 16 bytes, the exact memory a dedup-against-all-
  * history contract needs; image BYTES never reach state, only hashes.
  *
  * An image can lose to different claimers via different chunks (each a
  * separate observable row); consumers wanting only the verdict take
  * `distinct` on the id, as the gate query does. */
object PhashStream extends Serializable {

  /** Loser row: the image that lost, the chunk it lost in, the claimer
    * it lost to, and their exact hamming distance — observability for
    * "why was this dropped". */
  final case class ImgLoss(asset_id: Long, ci: Int, won_by: Long, dist: Int)

  final case class ClaimState(winner: Long, hash: Long)

  /** `chunkRows` must be the (asset_id, sh, ci, cv) stream —
    * `Dedup.hammingChunkKeys` over the hash stream (stateless, runs per
    * micro-batch at scan speed). */
  def onlineImageDedupStream(
      chunkRows: DataFrame,
      maxDist: Int = 3): Dataset[ImgLoss] = {
    import chunkRows.sparkSession.implicits._

    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    def update(
        key: (Int, Long),
        it: Iterator[(Long, Long, Int, Long)],
        state: GroupState[ClaimState]): Iterator[ImgLoss] = {
      val rows = it.map(r => (r._1, r._2)).toSeq.sortBy(_._1)
      state.getOption match {
        case Some(st) =>
          // claimed in an earlier batch: arrival order IS the contract;
          // the claimer's own at-least-once re-delivery never loses
          rows.filter(_._1 != st.winner)
            .collect { case (id, h) if dist(h, st.hash) <= maxDist =>
              ImgLoss(id, key._1, st.winner, dist(h, st.hash))
            }.iterator
        case None =>
          val (wid, wh) = rows.head // min id — rows sorted
          state.update(ClaimState(wid, wh))
          rows.tail
            .collect { case (id, h) if dist(h, wh) <= maxDist =>
              ImgLoss(id, key._1, wid, dist(h, wh))
            }.iterator
      }
    }

    chunkRows
      .selectExpr("asset_id", "sh", "ci", "cv")
      .as[(Long, Long, Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
