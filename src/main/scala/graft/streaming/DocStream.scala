package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A near-dup candidate pair on the ingest stream: `b` arrived in the
  * same or a later micro-batch than `a` (a < b by id within a batch). */
final case class DupCandidate(a: Long, b: Long)

/** One streamed ANN candidate: `vec_id` was accepted before `q_id`
  * arrived and lives in one of q's probed cells; `adc` is the IVFADC
  * distance (lower = closer). */
final case class AnnCandidate(q_id: Long, vec_id: Long, adc: Double)

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

  /**
   * Streaming IVFADC ANN lookups at ingest — the q106/q112 index
   * composed with the q103 frozen-quantizer pattern: coarse centroids
   * and residual-PQ codebooks are trained OFFLINE (batch
   * [[graft.operators.Similarity.ivfPqTrain]]) and frozen; each
   * arriving vector
   *
   *  1. probes its `nprobe` nearest cells, carrying one residual LUT
   *     per probed cell (computed scan-side, exactly the batch
   *     `ivfPqTopK` probe kernel);
   *  2. ADC-scans ONLY those cells' state — per cell, the (id, codes)
   *     of vectors ACCEPTED earlier whose home is that cell — keeping a
   *     bounded (adc ASC, vec_id ASC) top-k per (arrival, cell);
   *  3. then joins its own home cell's state with its PQ codes.
   *
   * "Accepted earlier" is deterministic: an earlier micro-batch, or
   * the same batch with a smaller id (within-batch arrival order is
   * undefined, so id order is imposed — same rule as
   * [[nearDupCandidates]]). The LUT/ADC arithmetic reproduces the
   * batch kernels' operation order, so the per-query top-k over the
   * emitted candidates is BIT-IDENTICAL to batch `ivfPqTopK` with
   * corpus = the vectors accepted before q (spec-asserted).
   *
   * Output is per-(arrival, probed cell) candidates, ≤ nprobe*k rows
   * per arrival; the final ≤ k merge (and any exact rerank) is a batch
   * concern downstream of the sink, like the near-dup exact-verify.
   * State per cell is the compact code list (m small ints + id + ts
   * per vector, never the embedding). TTL semantics are exactly
   * [[nearDupCandidates]]'s: with `tsCol`+`stateTtl` (+ watermark on
   * the input) an accepted vector stops matching once the watermark
   * passes ts + ttl, and idle cells are removed via event-time
   * timeout. A re-delivered id is skipped at its HOME cell (state
   * stays clean); its probe rows to OTHER cells may re-emit
   * candidates under at-least-once delivery — downstream dedup, as
   * with candidate pairs.
   */
  def ivfPqCandidates(
      docs: DataFrame,
      idCol: String,
      embCol: String,
      index: graft.operators.Similarity.IvfPqIndex,
      k: Int,
      nprobe: Int,
      tsCol: Option[String] = None,
      stateTtl: Option[java.time.Duration] = None): Dataset[AnnCandidate] = {
    require(k >= 1, "k must be >= 1")
    require(nprobe >= 1 && nprobe <= index.coarse.length, "nprobe must be in [1, nlist]")
    require(stateTtl.isEmpty || tsCol.nonEmpty, "stateTtl requires tsCol")
    require(stateTtl.forall(d => d.toMillis > 0), "stateTtl must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    // one pass per arrival: normalize, pick nprobe nearest cells, build
    // each cell's residual LUT, PQ-encode against the HOME (nearest)
    // cell — the same loops as the batch probe/encode kernels, in the
    // same order, so ADC doubles match bit-for-bit
    val probe = udf { v: Seq[Double] =>
      if (v == null) null
      else {
        val ix = bc.value
        val b = ix.books
        var nrm = 0.0
        v.foreach(x => nrm += x * x)
        nrm = math.sqrt(nrm)
        val unit = if (nrm > 0) v.map(_ / nrm) else v
        val ds = ix.coarse.indices.map { c =>
          var d = 0.0; var j = 0
          while (j < unit.length) { val df = unit(j) - ix.coarse(c)(j); d += df * df; j += 1 }
          (c, d)
        }
        val probes = ds.sortBy { case (c, d) => (d, c) }.take(nprobe)
        val home = probes.head._1
        val homeCt = ix.coarse(home)
        val codes = Array.tabulate(b.m) { s =>
          val cents = b.centroids(s)
          var bc2 = 0; var bd2 = Double.MaxValue
          var cc = 0
          while (cc < cents.length) {
            var d = 0.0; var j = 0
            while (j < b.dsub) {
              val diff = (unit(s * b.dsub + j) - homeCt(s * b.dsub + j)) - cents(cc)(j)
              d += diff * diff; j += 1
            }
            if (d < bd2) { bd2 = d; bc2 = cc }
            cc += 1
          }
          bc2
        }
        probes.zipWithIndex.map { case ((cell, _), pi) =>
          val ct = ix.coarse(cell)
          val lut = Array.tabulate(b.m) { s =>
            val cents = b.centroids(s)
            Array.tabulate(cents.length) { cc =>
              var d = 0.0; var j = 0
              while (j < b.dsub) {
                val diff = (unit(s * b.dsub + j) - ct(s * b.dsub + j)) - cents(cc)(j)
                d += diff * diff; j += 1
              }
              d
            }
          }
          (cell, lut, if (pi == 0) codes else null, pi == 0)
        }
      }
    }
    val tsExpr = tsCol.map(c => col(c)).getOrElse(lit(null).cast("timestamp"))
    val probedDf = docs
      .select(col(idCol).cast("long").as("id"), tsExpr.as("ts"),
        explode(probe(col(embCol).cast("array<double>"))).as("__p"))
      .select(col("id"), col("ts"), col("__p._1").as("cell"),
        col("__p._2").as("lut"), col("__p._3").as("codes"), col("__p._4").as("isHome"))
    // null event time with a TTL: same visible exclusion as nearDupCandidates
    val probed = (if (stateTtl.isDefined) probedDf.filter(col("ts").isNotNull) else probedDf)
      .as[(Long, java.sql.Timestamp, Int, Seq[Seq[Double]], Seq[Int], Boolean)]

    val ttlMs = stateTtl.map(_.toMillis)
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    // state = (id, arrivalMs, codes) per accepted home vector, newest first
    probed
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Long, Seq[Int])], AnnCandidate](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[List[(Long, Long, Seq[Int])]]) =>
          val wm = if (ttlMs.isDefined) state.getCurrentWatermarkMs() else Long.MinValue
          val live = state.getOption.getOrElse(Nil).filter {
            case (_, ts, _) => ttlMs.forall(t => ts + t > wm)
          }
          if (state.hasTimedOut) {
            if (live.isEmpty) state.remove()
            else {
              state.update(live)
              state.setTimeoutTimestamp(
                math.max(wm + 1, live.map { case (_, ts, _) => ts + ttlMs.get }.min))
            }
            Iterator.empty
          } else {
            // within-batch determinism: id order; first arrival wins on
            // re-delivery of a home row
            val fresh = rows.toSeq
              .groupBy(_._1).map { case (_, rs) => rs.minBy(r =>
                (if (r._2 == null) 0L else r._2.getTime, !r._6)) }
              .toSeq.sortBy(_._1)
            val acceptedIds = scala.collection.mutable.HashSet.empty[Long]
            live.foreach { case (id, _, _) => acceptedIds += id }
            val out = scala.collection.mutable.ArrayBuffer.empty[AnnCandidate]
            var accepted = live
            for ((id, tsRaw, _, lut, codes, isHome) <- fresh
                if !(isHome && acceptedIds.contains(id))) {
              val ts = if (tsRaw == null) 0L else tsRaw.getTime
              // bounded (adc ASC, vec_id ASC) top-k over this cell's state
              def lt(a: (Double, Long), b: (Double, Long)): Boolean =
                a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
              val top = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
              for ((vid, _, vcodes) <- accepted if vid != id) {
                var d = 0.0; var s = 0
                while (s < vcodes.length) { d += lut(s)(vcodes(s)); s += 1 }
                val cand = (d, vid)
                if (top.length < k || lt(cand, top.last)) {
                  val at = top.indexWhere(t => lt(cand, t))
                  top.insert(if (at < 0) top.length else at, cand)
                  if (top.length > k) top.remove(k)
                }
              }
              top.foreach { case (d, vid) => out += AnnCandidate(id, vid, d) }
              if (isHome) {
                accepted = (id, ts, codes) :: accepted
                acceptedIds += id
              }
            }
            if (accepted.isEmpty) state.remove() else state.update(accepted)
            for (t <- ttlMs if accepted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(wm + 1, accepted.map { case (_, ts, _) => ts + t }.min))
            out.iterator
          }
      }
  }

  /**
   * Streaming shard-drift bucket counts — the ingest-monitoring gate
   * run AS the shard streams in, completing the trio with the
   * cardinality (q115) and profile (q117) monitors. The bucket BOUNDS
   * are FROZEN from the reference shard (the q103/q78 frozen-quantizer
   * ingest discipline) and travel as literals; the only streaming
   * state is one mergeable count per bucket — |bounds|+1 rows TOTAL,
   * so drift state does NOT grow with the stream and no watermark is
   * needed (Complete mode re-emits the 9-row table per batch for
   * free). Bucket rule identical to the batch PSI (q121): the count
   * of bounds strictly below the value.
   */
  def driftBucketCounts(
      docs: DataFrame,
      valueCol: String,
      bounds: Seq[Double]): DataFrame = {
    require(bounds.nonEmpty, "driftBucketCounts: empty bounds")
    val bs = array(bounds.map(lit): _*)
    docs
      .withColumn("bucket",
        size(filter(bs, bd => col(valueCol).cast("double") > bd)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_cand"))
  }

  /**
   * PSI terms from candidate bucket counts vs FROZEN base-shard counts
   * — bit-identical arithmetic to the batch drift query (q121: same
   * half-count smoothing, same strict-greater bucket rule upstream,
   * same 6-decimal rounding), so a drift stream's final sink table
   * yields exactly the batch PSI on the same rows (spec-pinned).
   * Buckets present in only one side appear with a zero count.
   */
  def psiVsBase(cand: DataFrame, baseCounts: Seq[(Int, Long)]): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val base = baseCounts.toDF("bucket", "n_base")
    val joined = base.join(cand, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
    val totals = joined.agg(sum("n_base").as("tb"), sum("n_cand").as("tc"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket").cast("int").as("bucket"),
        col("n_base"), col("n_cand"),
        round(((col("n_cand") + lit(0.5)) / (col("tc") + lit(4.0))
            - (col("n_base") + lit(0.5)) / (col("tb") + lit(4.0)))
          * log(((col("n_cand") + lit(0.5)) / (col("tc") + lit(4.0)))
            / ((col("n_base") + lit(0.5)) / (col("tb") + lit(4.0)))), 6)
          .as("psi_term"))
      .orderBy("bucket")
  }
}
