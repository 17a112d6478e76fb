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
   * over the same documents (spec-asserted).
   *
   * Emits CANDIDATES (possibly duplicated across bands): candidate
   * volume scales with true duplication, and the exact-verify join is
   * a batch concern downstream of the sink. State per bucket is a
   * compact id list — the 100 TB levers are the same as batch banding
   * (bands/rows set the collision rate) plus a state TTL: production
   * ingest would add `GroupStateTimeout` eviction to bound state by
   * arrival window, trading recall against old-corpus pairs exactly
   * like the incremental batch operator's corpus cutoff.
   */
  def nearDupCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int = 16,
      rowsPerBand: Int = 4): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(graft.functions.MinHashBuckets.minhash_buckets(
          spark,
          graft.functions.ShingleHashes.shingle_hashes(spark, col(textCol), n),
          bands, rowsPerBand)))
      .toDF("id", "band", "bucket")
      .as[(Long, Int, Long)]

    banded
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[List[Long], DupCandidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[List[Long]]) =>
          val seen = state.getOption.getOrElse(Nil)
          // deterministic within-batch order: by id (arrival order is
          // not defined inside a micro-batch)
          val fresh = rows.map(_._1).toSeq.distinct.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[DupCandidate]
          var accepted = seen
          for (id <- fresh) {
            for (prev <- accepted if prev != id)
              out += (if (prev < id) DupCandidate(prev, id) else DupCandidate(id, prev))
            accepted = id :: accepted
          }
          state.update(accepted)
          out.iterator
      }
  }
}
