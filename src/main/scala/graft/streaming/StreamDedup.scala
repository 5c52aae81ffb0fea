package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming online fuzzy dedup — the continuous-ingestion twin of
  * `Dedup.onlineDedup`: every incoming doc's MinHash band buckets are
  * claimed first-writer-wins, and docs that hit an already-claimed bucket
  * are emitted as LOSERS (the drop feed a downstream writer anti-joins;
  * emitting losers rather than keepers lets the operator stay append-mode
  * with NO watermark — a doc's verdict is complete within its own
  * micro-batch, since all of its bands arrive with it).
  *
  * Contract: ACROSS batches, arrival order wins — a bucket claimed in an
  * earlier batch beats any later doc regardless of id (that is what
  * "online" means; replaying the whole corpus as one batch reduces to the
  * batch operator's min-id-wins and shares its oracle). WITHIN a batch,
  * the min id wins, which keeps replays deterministic under any file
  * split.
  *
  * State: ONE long per distinct (band, bucket) ever seen — the winning
  * id. This is the operator's memory of the corpus, the same information
  * a bloom-filter dedup keeps, except exact; it does not expire, because
  * the contract is "dedup against all history" (bound it by re-sharding
  * the corpus epoch when the bucket space ages out). */
object StreamDedup extends Serializable {

  /** Loser row: the doc that lost, and the bucket (band, bucket) plus
    * winning id it lost to — observability for "why was this dropped". */
  final case class Loss(doc_id: Long, band: Int, bucket: String, won_by: Long)

  final case class BucketState(winner: Long)

  /** `bandRows` must be the (doc_id, band, bucket) stream —
    * `Dedup.bandKeys` over the doc stream (the banding projection is
    * stateless, so it runs per micro-batch at scan speed). Returns the
    * loser feed; a doc appears once per lost bucket (distinct downstream
    * if only the verdict matters). */
  def onlineDedupStream(bandRows: DataFrame): Dataset[Loss] = {
    import bandRows.sparkSession.implicits._

    def update(
        key: (Int, String),
        it: Iterator[(Long, Int, String)],
        state: GroupState[BucketState]): Iterator[Loss] = {
      val ids = it.map(_._1).toSeq
      state.getOption match {
        case Some(st) =>
          // bucket already claimed in an earlier batch: every arrival
          // loses, regardless of id — arrival order IS the contract.
          // EXCEPT the winner itself: at-least-once upstream delivery
          // (backfill replay, re-ingest against the same checkpoint) can
          // re-present the claiming doc, and emitting it as its own
          // loser would make the documented anti-join consumer drop the
          // bucket's only survivor
          ids.filter(_ != st.winner).sorted
            .map(Loss(_, key._1, key._2, st.winner)).iterator
        case None =>
          val winner = ids.min
          state.update(BucketState(winner))
          ids.filter(_ != winner).sorted
            .map(Loss(_, key._1, key._2, winner)).iterator
      }
    }

    bandRows
      .selectExpr("doc_id", "band", "bucket")
      .as[(Long, Int, String)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
