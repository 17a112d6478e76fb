package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Per-user funnel result: how far along `view -> click -> purchase`
  * the user got, with the stage timestamps (epoch seconds). */
final case class FunnelOut(
    user_id: Long,
    stage: Int,
    t_view: Option[Long],
    t_click: Option[Long],
    t_purchase: Option[Long]) extends Serializable

/**
 * Funnel-stage analysis over the typed Dataset API
 * (`KeyValueGroupedDataset.mapGroups`): per user, the earliest view,
 * the earliest click at-or-after it, and the earliest purchase
 * at-or-after that (`>=` on epoch seconds — the same semantics the
 * SQL oracle expresses with three staged min-aggregates).
 *
 * One shuffle on the user key; per-group work is three passes over
 * that user's events in memory. mapGroups is the right tool exactly
 * here: the staged-minimum recurrence is awkward as joins (three
 * aggregate+join rounds) but trivial imperative code per group, and
 * user event counts are bounded. This is the typed mirror of the
 * untyped operators elsewhere — case-class Encoders end to end.
 */
object Funnel {

  def funnelStages(events: Dataset[graft.streaming.Event]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toIndexedSeq
        def minAtOrAfter(tpe: String, from: Long): Option[Long] = {
          var best = Long.MaxValue
          evs.foreach { e =>
            if (e.event_type == tpe && e.sec >= from && e.sec < best) best = e.sec
          }
          if (best == Long.MaxValue) None else Some(best)
        }
        val tv = minAtOrAfter("view", Long.MinValue)
        val tc = tv.flatMap(t => minAtOrAfter("click", t))
        val tp = tc.flatMap(t => minAtOrAfter("purchase", t))
        val stage = Seq(tv, tc, tp).takeWhile(_.isDefined).length
        FunnelOut(uid, stage, tv, tc, tp)
      }
      .toDF()
  }
}
