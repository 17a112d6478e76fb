package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof join: inclusive <=, last-before wins, null when no predecessor") {
    val clicks = Seq(
      (1L, 10L, 100L), // before any purchase -> null
      (2L, 20L, 100L), // exactly at purchase t=20 -> inclusive match
      (3L, 35L, 100L), // between purchases -> t=20 one
      (4L, 50L, 100L), // after both -> t=40 one
      (5L, 15L, 200L)  // other key, no purchases -> null
    ).toDF("event_id", "tsu", "user_id")
    val purchases = Seq(
      (11L, 20L, 100L, 2.5),
      (12L, 40L, 100L, 7.0)
    ).toDF("event_id", "tsu", "user_id", "value")

    val got = AsOfJoin.asofJoin(clicks, purchases, "user_id", "tsu", "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

    assert(got == Set(
      (1L, None, None),
      (2L, Some(11L), Some(2.5)),
      (3L, Some(11L), Some(2.5)),
      (4L, Some(12L), Some(7.0)),
      (5L, None, None)))
  }

  test("asof join: equal right timestamps -> greatest tie-break id wins") {
    val left = Seq((1L, 30L, 9L)).toDF("event_id", "tsu", "user_id")
    val right = Seq(
      (21L, 30L, 9L, 1.0),
      (22L, 30L, 9L, 2.0) // same ts, higher id -> should win
    ).toDF("event_id", "tsu", "user_id", "value")
    val r = AsOfJoin.asofJoin(left, right, "user_id", "tsu", "event_id")
      .select("asof_event_id", "asof_value").collect().head
    assert(r.getLong(0) == 22L && r.getDouble(1) == 2.0)
  }

  test("asof join == brute-force latest-predecessor on real events") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.EventTime
      .normalize(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .withColumn("tsu", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tsu")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "tsu", "event_id", "value")

    val got = AsOfJoin.asofJoin(clicks, purchases, "user_id", "tsu", "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = clicks.collect().map { c =>
      val (cid, uid, t) = (c.getLong(0), c.getLong(1), c.getLong(2))
      val preds = ps.filter(p => p._1 == uid && p._2 <= t)
      cid -> (if (preds.isEmpty) None
              else Some(preds.maxBy(p => (p._2, p._3))._3))
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.exists(_.isDefined))
  }

  test("asof join plan: single shuffle on the key, no range join blow-up") {
    val left = Seq((1L, 30L, 9L)).toDF("event_id", "tsu", "user_id")
    val right = Seq((21L, 30L, 9L, 1.0)).toDF("event_id", "tsu", "user_id", "value")
    val plan = AsOfJoin.asofJoin(left, right, "user_id", "tsu", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin")
      && !plan.contains("BroadcastNestedLoopJoin"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), s"expected window-based asof plan:\n$plan")
  }
}
