package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming near-dup candidates across micro-batches == batch MinHash-LSH pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val rows = docs.as[(Long, String)].collect().toSeq

    val mem = MemoryStream[(Long, String)]
    val out = DocStream.nearDupCandidates(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", n = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dup_cand").start()
    try {
      // three micro-batches: pairs must form across batch boundaries
      // (later arrival vs standing state), not just within one batch
      val chunks = rows.grouped((rows.size + 2) / 3).toSeq
      for (c <- chunks) { mem.addData(c); q.processAllAvailable() }

      val cands = spark.table("dup_cand")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // exact-verify the candidates the way the batch operator does,
      // then compare against the batch result on the same corpus
      val texts = rows.toMap
      def shingles(s: String): Set[Seq[String]] =
        graft.functions.HashExprs.tokenize(s).sliding(3).map(_.toSeq).toSet
      def jaccard(a: Long, b: Long): Double = {
        val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      val verified = cands.filter { case (a, b) => jaccard(a, b) >= 0.8 }

      val batch = graft.operators.Dedup
        .minHashLshPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(batch.nonEmpty, "corpus should contain near-dup pairs")
      assert(verified == batch,
        s"streaming-verified=${verified.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("re-delivered doc ids neither duplicate state nor re-emit pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = (1L, "the quick brown fox jumps over the lazy dog today")
    val b = (2L, "the quick brown fox jumps over the lazy dog tonight")
    val mem = MemoryStream[(Long, String)]
    val out = DocStream.nearDupCandidates(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", n = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dup_redeliver").start()
    try {
      mem.addData(Seq(a)); q.processAllAvailable()
      mem.addData(Seq(a)); q.processAllAvailable() // at-least-once re-delivery
      mem.addData(Seq(b)); q.processAllAvailable()
      mem.addData(Seq(b)); q.processAllAvailable()
      val cands = spark.table("dup_redeliver")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // (1,2) appears once per colliding band — but the re-deliveries
      // must not inflate that count (pre-fix: state held id 1 twice and
      // batch 3 emitted every pair twice)
      assert(cands.nonEmpty && cands.forall(_ == ((1L, 2L))))
      val perBand = cands.length
      // re-run WITHOUT re-delivery: the per-band candidate count must match
      val mem2 = MemoryStream[(Long, String)]
      val out2 = DocStream.nearDupCandidates(
        mem2.toDF().toDF("doc_id", "text"), "doc_id", "text", n = 3)
      val q2 = out2.writeStream.outputMode("append")
        .format("memory").queryName("dup_clean").start()
      try {
        mem2.addData(Seq(a)); q2.processAllAvailable()
        mem2.addData(Seq(b)); q2.processAllAvailable()
        assert(spark.table("dup_clean").count() == perBand.toLong)
      } finally q2.stop()
    } finally q.stop()
  }

  test("stateTtl evicts old bucket entries: no pairs across the arrival window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again"
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = DocStream.nearDupCandidates(
      mem.toDF().toDF("doc_id", "ts", "text").withWatermark("ts", "0 seconds"),
      "doc_id", "text", n = 3,
      tsCol = Some("ts"), stateTtl = Some(java.time.Duration.ofMinutes(10)))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dup_ttl").start()
    try {
      // NOTE the watermark a stateful op sees in batch N is the one
      // committed at the END of batch N-1 — eviction lags one batch, so
      // the window boundary is driven by an unrelated doc (9) that
      // advances the watermark past 1/2's windows BEFORE 3 arrives.
      mem.addData(Seq((1L, ts(100), text))); q.processAllAvailable()
      // inside the window: pairs with doc 1
      mem.addData(Seq((2L, ts(105), text))); q.processAllAvailable()
      // unrelated doc advances the watermark to t=200min (no shared
      // shingles -> no shared buckets -> no pairs)
      mem.addData(Seq((9L, ts(200), "completely different words about ships and stars and maps")))
      q.processAllAvailable()
      // 1 and 2 are now evicted (their ts+ttl < watermark): identical
      // doc 3 must NOT pair with them
      mem.addData(Seq((3L, ts(205), text))); q.processAllAvailable()
      // but 4, inside 3's window, pairs with 3
      mem.addData(Seq((4L, ts(210), text))); q.processAllAvailable()
      val cands = spark.table("dup_ttl")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cands.contains((1L, 2L)) && cands.contains((3L, 4L)), s"got $cands")
      // doc 3/4 must not pair with the evicted 1/2 even though identical
      assert(!cands.exists { case (x, y) => x <= 2 && y >= 3 },
        s"pair across the evicted window: $cands")
    } finally q.stop()
  }

  test("stateTtl: state size plateaus under a long stream instead of growing with it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40 batches of distinct-text docs, each opening ~bands new buckets;
    // timestamps advance 5 min per batch, TTL 10 min — only the last
    // ~2-3 docs' buckets can be live, so total state rows must plateau
    // far below the no-TTL growth of ~16 buckets x 40 docs
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    def text(i: Int) =
      (0 until 12).map(k => s"w${i}_$k").mkString(" ") // unique shingles per doc
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = DocStream.nearDupCandidates(
      mem.toDF().toDF("doc_id", "ts", "text").withWatermark("ts", "0 seconds"),
      "doc_id", "text", n = 3,
      tsCol = Some("ts"), stateTtl = Some(java.time.Duration.ofMinutes(10)))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dup_plateau").start()
    try {
      val totals = (1 to 40).map { i =>
        mem.addData(Seq((i.toLong, ts(i * 5), text(i))))
        q.processAllAvailable()
        q.lastProgress.stateOperators.headOption.map(_.numRowsTotal).getOrElse(0L)
      }
      assert(spark.table("dup_plateau").count() == 0) // nothing collides
      // growth bound: the last-batch state is a small multiple of one
      // doc's bucket count, nowhere near the 40-doc accumulation
      val buckets = 16 // bands
      assert(totals.last <= 4L * buckets,
        s"state did not plateau: ${totals.mkString(",")}")
      assert(totals.max <= 6L * buckets,
        s"state spiked: ${totals.mkString(",")}")
    } finally q.stop()
  }
}
