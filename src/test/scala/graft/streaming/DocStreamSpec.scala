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
}
