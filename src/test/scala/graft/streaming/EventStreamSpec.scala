package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def eventsBatch = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.EventTime.normalize(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
  }

  test("streaming hourly windowed agg over MemoryStream == batch groupBy on same rows") {
    import spark.implicits._
    val rows = eventsBatch
      .select($"event_id", unix_timestamp($"ts").as("sec"), $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val streamDf = mem.toDF().withColumn("ts", timestamp_seconds(col("sec")))
    val q = EventStream.hourlyWindowedAgg(streamDf)
      .writeStream.outputMode("complete").format("memory").queryName("hourly_out").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .select("hr", "event_type", "n", "total")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventStream.hourlyWindowedAgg(eventsBatch)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions with correct event counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      // user 1: two sessions (gap 7200s > 1800s); user 2: one session
      mem.addData(Seq(
        Event(1, 1000, 1, "click", 1.0),
        Event(2, 1500, 1, "click", 1.0),
        Event(3, 1600, 2, "view", 2.0)))
      q.processAllAvailable()
      mem.addData(Seq(
        Event(4, 9000, 1, "click", 1.0), // closes user 1's first session
        Event(5, 9100, 1, "buy", 5.0)))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .as[SessionOut].collect().toSet
      assert(out == Set(SessionOut(1, 1, 2, 1500)))
    } finally q.stop()
  }

  test("streaming session_window == batch q119 on the real events fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // second-floored real rows (the q119 preparation)
    // event-time order: an unsorted split would let batch 1's watermark
    // (max - 10 min) drop older events arriving in batch 2
    val rows = eventsBatch
      .select($"event_id", unix_timestamp($"ts").as("sec"), $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(e => (e.sec, e.event_id))
    val maxSec = rows.map(_.sec).max
    // append mode emits a session only when the watermark passes its
    // end; a far-future sentinel event advances the watermark so every
    // real session closes. Sentinel user id is outside the fixture.
    val sentinel = Event(-1L, maxSec + 86400L, -1L, "flush", 0.0)

    val mem = MemoryStream[Event]
    val streamDf = mem.toDF().withColumn("ts", timestamp_seconds(col("sec")))
    val q = EventStream.sessionWindowAgg(streamDf)
      .writeStream.outputMode("append").format("memory").queryName("swin_out").start()
    try {
      val (first, rest) = rows.splitAt(rows.size / 2)
      mem.addData(first)
      q.processAllAvailable()
      mem.addData(rest)
      q.processAllAvailable()
      mem.addData(Seq(sentinel))
      q.processAllAvailable()
      val streamed = spark.table("swin_out")
        .filter(col("user_id") =!= -1L)
        .select("user_id", "sess_start", "sess_end", "n_events", "total")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val batch = graft.SparkEntry
        .queries("q119_session_window")(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed == batch,
        s"streaming-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("late event inside the watermark merges two open sessions; below it, dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1: user 1 opens TWO sessions — [8000, 9800) and
    // [10000, 11800) (gap 2000 > 1800). Watermark after the batch is
    // 10000 - 600 = 9400, below both session ends, so both stay open.
    val batch1 = Seq(
      Event(1, 8000, 1, "view", 1.0),
      Event(2, 10000, 1, "view", 2.0))
    // batch 2: a LATE event at 9500 (event time before the already-seen
    // 10000, but its would-be session end 11300 is past the 9400
    // watermark) bridges the two sessions — within gap of both — so the
    // state must MERGE them into one [8000, 11800) session. A second
    // late event at 7000 has session end 8800 < watermark 9400 — the
    // aggregation's late-row rule (window END vs watermark) drops it.
    val batch2 = Seq(
      Event(3, 9500, 1, "click", 4.0),
      Event(4, 7000, 1, "click", 8.0))
    val sentinel = Event(-1, 10000 + 86400L, -1, "flush", 0.0)

    val mem = MemoryStream[Event]
    val streamDf = mem.toDF().withColumn("ts", timestamp_seconds(col("sec")))
    val q = EventStream.sessionWindowAgg(streamDf)
      .writeStream.outputMode("append").format("memory").queryName("late_out").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
      mem.addData(Seq(sentinel)); q.processAllAvailable()
      val streamed = spark.table("late_out")
        .filter(col("user_id") =!= -1L)
        .select("user_id", "sess_start", "sess_end", "n_events", "total")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      // batch recompute over exactly the ACCEPTED rows (the 7000 event
      // is gone — watermark semantics, not session semantics)
      val accepted = (batch1 :+ batch2.head).toDS()
        .withColumn("ts", timestamp_seconds(col("sec")))
      val batch = EventStream.sessionWindowAgg(accepted)
        .select("user_id", "sess_start", "sess_end", "n_events", "total")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      // the merge happened: ONE session spanning both originals, with
      // exactly the three accepted events (the 7000 straggler excluded)
      assert(streamed == Set((1L, 8000L, 11800L, 3L, 7.0)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replayed events, keeps distinct ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val streamDf = mem.toDF().withColumn("ts", timestamp_seconds(col("sec")))
    val q = EventStream.dedupWithinWatermark(streamDf, Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      mem.addData(Seq(
        Event(1, 1000, 1, "click", 1.0),
        Event(1, 1000, 1, "click", 1.0), // exact replay in same batch
        Event(2, 1010, 1, "view", 2.0)))
      q.processAllAvailable()
      mem.addData(Seq(
        Event(2, 1010, 1, "view", 2.0), // replay in a later batch, within delay
        Event(3, 1020, 2, "click", 3.0)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join == batch RangeJoin on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Event(100, 5000, 1, "click", 0.0), Event(101, 9000, 1, "click", 0.0),
      Event(102, 5000, 2, "click", 0.0))
    val views = Seq(
      Event(200, 2000, 1, "view", 0.0), // within 1h of click 100 and 101
      Event(201, 8990, 1, "view", 0.0), // within 1h of 101 only
      Event(202, 90000, 1, "view", 0.0), // after everything
      Event(203, 4000, 2, "view", 0.0)) // user 2
    val memC = MemoryStream[Event]
    val memV = MemoryStream[Event]
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_seconds(col("sec")))
    val q = EventStream.clickViewIntervalJoin(withTs(memC.toDF()), withTs(memV.toDF()))
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      memC.addData(clicks); memV.addData(views)
      q.processAllAvailable()
      val got = spark.table("ssj_out").select("click_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch mirror: RangeJoin over the same rows
      val cDf = clicks.toDF().select($"event_id".as("click_id"), $"user_id", $"sec")
      val vDf = views.toDF().select($"user_id", $"sec".as("vsec"), $"event_id".as("view_id"))
      val batch = graft.operators.RangeJoin
        .intervalJoin(cDf, vDf, "user_id", "sec", "vsec", 3600L)
        .select("click_id", "ij_view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch)
      assert(got == Set((100L, 200L), (101L, 201L), (102L, 203L)))
    } finally q.stop()
  }

  test("file-source stream -> windowed agg -> parquet sink round-trips vs batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // stage the RAW events parquet (nanos ts) as a stream-source
    // directory — readEventsStream owns the nanos->timestamp conversion
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(srcDir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    val q = EventStream.hourlyWindowedAgg(
        EventStream.readEventsStream(spark, srcDir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    // append mode only emits windows the watermark has closed; every
    // emitted row must match the batch computation exactly
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStream.hourlyWindowedAgg(eventsBatch)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty, "no closed windows reached the sink")
    assert(streamed.subsetOf(batch),
      s"stream emitted rows absent from batch: ${streamed.diff(batch)}")
  }

  test("streaming funnel state == batch funnel on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventsBatch
      .select($"event_id", unix_timestamp($"ts").as("sec"), $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq
    val mem = MemoryStream[Event]
    val q = EventStream.funnelStream(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName("funnel_out").start()
    try {
      // split across two micro-batches by event time (sorted), so state
      // genuinely carries across batches
      val sorted = rows.sortBy(e => (e.sec, e.event_id))
      val (b1, b2) = sorted.splitAt(sorted.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = spark.table("funnel_out")
        .groupBy("user_id").agg(max(struct("stage", "t_view", "t_click", "t_purchase")).as("s"))
        .select("user_id", "s.stage", "s.t_view", "s.t_click", "s.t_purchase")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.get(2), r.get(3), r.get(4)))).toMap
      val batch = graft.operators.Funnel.funnelStages(rows.toDS())
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.get(2), r.get(3), r.get(4)))).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("watermark bounds state: agg plan carries the 10-minute watermark") {
    val plan = EventStream.hourlyWindowedAgg(eventsBatch).queryExecution.analyzed.toString
    assert(plan.contains("10 minutes") || plan.contains("600000"))
  }
}
