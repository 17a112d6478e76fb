package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A near-dup candidate pair on the ingest stream: `b` arrived in the
  * same or a later micro-batch than `a` (a < b by id within a batch). */
final case class DupCandidate(a: Long, b: Long)

/**
 * Streaming document-ingest operators — the dedup-at-ingest shape:
 * documents arrive continuously, and each must be checked against
 * everything ALREADY ACCEPTED without re-pairing the standing corpus
 * (the streaming sibling of [[graft.operators.Dedup.crossCorpusPairs]]).
 */
object DocStream {

  /**
   * MinHash-LSH near-dup CANDIDATES over a document stream.
   *
   * Same banding as the batch operator: signatures -> per-band bucket
   * keys (the scan-side native expressions work unchanged on streaming
   * plans). The stateful stage keys by (band, bucket) and holds the
   * doc ids seen in that bucket; a new arrival emits one candidate
   * pair per stored id, then joins the state. Exactly the batch
   * candidate rule, so after downstream dedup + exact verification the
   * accepted-pair set equals [[graft.operators.Dedup.minHashLshPairs]]
   * over the same documents (spec-asserted). A doc id that RE-ARRIVES
   * (at-least-once sources, re-ingestion) is recognized in state and
   * skipped — no duplicate state entries, no duplicate pair emission.
   *
   * Emits CANDIDATES (possibly duplicated across bands): candidate
   * volume scales with true duplication, and the exact-verify join is
   * a batch concern downstream of the sink. State per bucket is a
   * compact id list — the 100 TB levers are the same as batch banding
   * (bands/rows set the collision rate) PLUS the state TTL: pass
   * `tsCol` + `stateTtl` (and set `withWatermark` on the input) to
   * bound state by arrival window — an id is dropped from its buckets
   * once the watermark passes `ts + ttl`, trading recall against
   * old-corpus pairs exactly like the incremental batch operator's
   * corpus cutoff. Without a TTL the state grows with the distinct
   * (band, bucket, id) volume — fine for bounded backfills, not for
   * an unbounded production stream.
   *
   * @param tsCol    event-time timestamp column (TimestampType or
   *                 castable); required when `stateTtl` is set. The
   *                 caller must apply `withWatermark(tsCol, ...)` to
   *                 `docs` — event-time timeouts need a watermark.
   * @param stateTtl arrival window: bucket entries older than this
   *                 (vs the watermark) are evicted and can no longer
   *                 form pairs; idle buckets are removed entirely via
   *                 `GroupStateTimeout.EventTimeTimeout`.
   */
  def nearDupCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      tsCol: Option[String] = None,
      stateTtl: Option[java.time.Duration] = None): Dataset[DupCandidate] = {
    require(stateTtl.isEmpty || tsCol.nonEmpty, "stateTtl requires tsCol")
    require(stateTtl.forall(d => d.toMillis > 0), "stateTtl must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ts column must flow through AS ITS WATERMARKED SELF (not a
    // unix_millis projection — that strips the watermark metadata the
    // event-time-timeout checker looks for)
    val tsExpr = tsCol.map(c => col(c)).getOrElse(lit(null).cast("timestamp"))
    val bandedDf = docs
      .select(col(idCol).cast("long").as("id"), tsExpr.as("ts"),
        posexplode(graft.functions.MinHashBuckets.minhash_buckets(
          spark,
          graft.functions.ShingleHashes.shingle_hashes(spark, col(textCol), n),
          bands, rowsPerBand)))
      .toDF("id", "ts", "band", "bucket")
    // with a TTL, a null event time has no position in the arrival
    // window: it would otherwise default to epoch 0, be evicted by the
    // first real watermark, and silently never pair again. Null-ts
    // rows also bypass Spark's late-event watermark filter, so they
    // must be excluded here, visibly, not mis-stamped.
    val banded = (if (stateTtl.isDefined) bandedDf.filter(col("ts").isNotNull) else bandedDf)
      .as[(Long, java.sql.Timestamp, Int, Long)]

    val ttlMs = stateTtl.map(_.toMillis)
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    // state = (id, arrivalMs) per accepted id in this bucket, newest first
    banded
      .groupByKey { case (_, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[List[(Long, Long)], DupCandidate](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[List[(Long, Long)]]) =>
          val wm = if (ttlMs.isDefined) state.getCurrentWatermarkMs() else Long.MinValue
          // evict entries the watermark has passed: no future arrival
          // (ts >= wm) can land inside their window anymore
          val live = state.getOption.getOrElse(Nil).filter {
            case (_, ts) => ttlMs.forall(t => ts + t > wm)
          }
          if (state.hasTimedOut) {
            // idle-bucket cleanup tick: no new rows, just shed state
            if (live.isEmpty) state.remove()
            else {
              state.update(live)
              state.setTimeoutTimestamp(
                math.max(wm + 1, live.map { case (_, ts) => ts + ttlMs.get }.min))
            }
            Iterator.empty
          } else {
            // deterministic within-batch order: by id (arrival order is
            // not defined inside a micro-batch); first arrival wins for
            // a re-delivered id — already-accepted ids are SKIPPED, so
            // at-least-once delivery cannot duplicate state or pairs
            val fresh = rows
              .map { case (id, ts, _, _) => (id, if (ts == null) 0L else ts.getTime) }
              .toSeq
              .groupBy(_._1).map { case (id, ms) => (id, ms.map(_._2).min) }
              .toSeq.sortBy(_._1)
            val acceptedIds = scala.collection.mutable.HashSet.empty[Long]
            live.foreach { case (id, _) => acceptedIds += id }
            val out = scala.collection.mutable.ArrayBuffer.empty[DupCandidate]
            var accepted = live
            for ((id, ts) <- fresh if !acceptedIds.contains(id)) {
              for ((prev, _) <- accepted)
                out += (if (prev < id) DupCandidate(prev, id) else DupCandidate(id, prev))
              accepted = (id, ts) :: accepted
              acceptedIds += id
            }
            if (accepted.isEmpty) state.remove() else state.update(accepted)
            for (t <- ttlMs if accepted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(wm + 1, accepted.map { case (_, ts) => ts + t }.min))
            out.iterator
          }
      }
  }
}
