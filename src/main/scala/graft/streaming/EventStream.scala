package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event, as carried on the stream (epoch-second timestamps keep
  * the schema engine-agnostic; `tsCol` converts for window ops). */
final case class Event(
    event_id: Long,
    sec: Long,
    user_id: Long,
    event_type: String,
    value: Double) extends Serializable

/** Per-user session state for [[EventStream.sessionize]]. */
final case class SessionState(sessionId: Long, lastSec: Long, eventsInSession: Long)
    extends Serializable

/** A closed (or timed-out) session emitted downstream. */
final case class SessionOut(user_id: Long, session_id: Long, n_events: Long, last_sec: Long)
    extends Serializable

/** Per-user funnel progression state for [[EventStream.funnelStream]]. */
final case class FunnelState(tv: Option[Long], tc: Option[Long], tp: Option[Long])
    extends Serializable

/**
 * Structured Streaming operators over the `events` shape
 * (TESTDATA.md): windowed aggregation with watermarking, and custom
 * sessionization state via `flatMapGroupsWithState` — the streaming
 * mirror of the batch q14/q15 queries, so batch and stream results can
 * be cross-checked on the same input.
 *
 * Scale notes: the aggregation state is bounded by the watermark
 * (late data beyond 10 minutes is dropped, state for closed windows is
 * evicted); sessionization state is per-user and evicted via processing
 * -time timeout; both shuffle once on their grouping key.
 */
object EventStream {

  /** Tumbling 1-hour windowed counts/sums with a 10-minute watermark.
    * Works on any DataFrame with (ts timestamp, event_type, value) —
    * streaming or batch, same plan. */
  def hourlyWindowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(
        unix_timestamp(col("window.start")).as("hr"),
        col("event_type"), col("n"), col("total"))

  /**
   * Custom stateful sessionization (30-minute inactivity gap) via
   * `flatMapGroupsWithState`: emits a [[SessionOut]] row every time a
   * session closes (a new event for the user arrives past the gap).
   * Event-time ordering within a micro-batch is restored by sorting the
   * group iterator (streams deliver per-key batches unordered).
   * NoTimeout keeps micro-batching data-driven (a processing-time
   * timeout would add wall-clock-driven empty batches; an open session
   * with no further events stays in state until the stream ends).
   */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.sec, e.event_id))
          var cur = state.getOption
          val closed = IndexedSeq.newBuilder[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.sec - s.lastSec <= gapSeconds =>
                cur = Some(s.copy(lastSec = e.sec, eventsInSession = s.eventsInSession + 1))
              case Some(s) =>
                closed += SessionOut(userId, s.sessionId, s.eventsInSession, s.lastSec)
                cur = Some(SessionState(s.sessionId + 1, e.sec, 1))
              case None =>
                cur = Some(SessionState(1, e.sec, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /**
   * Native session-window aggregation — the same plan runs streaming
   * (state-backed, watermark-bounded: a session's state is dropped
   * once the watermark passes its end) or batch (where the watermark
   * is a no-op). In append mode a session emits exactly once, when the
   * watermark closes it — the scale-correct contract (emitting
   * per-update would re-shuffle every session on every batch).
   * Expects (user_id, ts timestamp, value); timestamps should be
   * second-floored upstream if cross-engine second-precision parity
   * matters (see q119).
   */
  def sessionWindowAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("sess_start"),
        unix_timestamp(col("sw.end")).as("sess_end"),
        col("n_events"), col("total"))

  /**
   * Streaming dedup: drops events whose `idCols` were already seen
   * within the watermark delay. The watermark bounds the dedup state
   * (exactly-once by key forever would need unbounded state at 100 TB/
   * day; within-watermark is the standard at-scale contract — state is
   * evicted once the key's event time passes out of the delay window).
   */
  def dedupWithinWatermark(
      events: DataFrame,
      idCols: Seq[String],
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /**
   * Stream-stream interval join — the streaming mirror of the batch
   * [[graft.operators.RangeJoin]] (q57): each click is joined to the
   * same user's views in the preceding `windowSec` seconds. Both sides
   * carry watermarks so the join STATE IS BOUNDED: a buffered view can
   * be evicted once it is older than the click watermark minus the
   * join window (Spark derives the eviction bound from the interval
   * condition + both watermarks — without the time bound the state
   * would grow forever, the cardinal sin of stream joins at scale).
   * Inputs need (user_id, event_id, ts) columns.
   */
  def clickViewIntervalJoin(
      clicks: DataFrame,
      views: DataFrame,
      windowSec: Long = 3600L,
      delay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", delay)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val v = views.withWatermark("ts", delay)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("v_ts") <= col("c_ts"))
      .select(col("click_id"), col("c_user").as("user_id"), col("view_id"),
        unix_timestamp(col("c_ts")).as("click_sec"),
        unix_timestamp(col("v_ts")).as("view_sec"))
  }

  /**
   * Streaming funnel tracking — the stateful-stream mirror of the
   * batch [[graft.operators.Funnel]]: per user, the earliest view,
   * earliest click at-or-after it, earliest purchase at-or-after that,
   * maintained incrementally across micro-batches with
   * `mapGroupsWithState` (per-user state is three optional longs —
   * constant size, unlike buffering the events). Emits the user's
   * current [[graft.operators.FunnelOut]] after every batch that
   * touches the user (Update mode); the final state equals the batch
   * operator's output on the same rows.
   *
   * Caveat shared with any incremental funnel: a stage minimum only
   * moves FORWARD in event-time as data arrives, so out-of-order
   * delivery ACROSS micro-batches can yield a different (later-stage)
   * result than batch — deliver in event-time order (or batch-replay)
   * when exact parity matters; within one micro-batch ordering is
   * handled here.
   */
  def funnelStream(events: Dataset[Event]): Dataset[graft.operators.FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, graft.operators.FunnelOut](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val s0 = state.getOption.getOrElse(FunnelState(None, None, None))
          var (tv, tc, tp) = (s0.tv, s0.tc, s0.tp)
          // event-time order within the batch; state carries order
          // across batches
          val evs = it.toIndexedSeq.sortBy(e => (e.sec, e.event_id))
          evs.foreach { e =>
            e.event_type match {
              case "view" if tv.isEmpty => tv = Some(e.sec)
              case "click" if tc.isEmpty && tv.exists(_ <= e.sec) => tc = Some(e.sec)
              case "purchase" if tp.isEmpty && tc.exists(_ <= e.sec) => tp = Some(e.sec)
              case _ =>
            }
          }
          state.update(FunnelState(tv, tc, tp))
          val stage = Seq(tv, tc, tp).takeWhile(_.isDefined).length
          graft.operators.FunnelOut(uid, stage, tv, tc, tp)
      }
  }

  /** Read a directory of events parquet part-files as a stream — the
    * standard file-source layout (new files appearing in the directory
    * become micro-batches; one file per trigger for determinism).
    * Spark's file source requires a directory, not a single file. */
  def readEventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    graft.EventTime.normalize(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(eventsDir))
  }
}
