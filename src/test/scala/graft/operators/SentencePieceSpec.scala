package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/**
 * The unigram-LM tokenizer's contracts: the pinned q157 artifact is
 * exactly what training on sf0.001 produces (provenance + determinism
 * + layout stability), Viterbi segmentation is a lossless argmax with
 * the pinned total order, and the frozen-artifact discipline makes
 * streaming ingest equal batch bit-for-bit.
 */
class SentencePieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("pinned artifact == train(sf0.001), also under a different physical layout") {
    val art = SentencePiece.train(docs, "text")
    assert(art.toSeq == graft.SparkEntry.SentencePieceScores,
      "pinned SentencePieceScores no longer match training on sf0.001")
    val art2 = SentencePiece.train(docs.repartition(7, col("doc_id")), "text")
    assert(art2.toSeq == art.toSeq, "training depends on physical layout")
  }

  test("viterbi: lossless concat, argmax over enumeration, pinned tie-break, [UNK]") {
    val scores = graft.SparkEntry.SentencePieceScores.toMap
    // lossless: pieces concatenate back to every corpus word
    val words = docs.select(explode(split(trim(col("text")), graft.Tok.WsPlus)).as("w"))
      .filter(length(col("w")) > 0).distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    for (w <- words) {
      val s = SentencePiece.viterbi(w, scores)
      assert(s.pieces.mkString("") == w, s"lossy segmentation of '$w': ${s.pieces}")
      // argmax: exhaustive enumeration finds no strictly better path
      def enum(off: Int, acc: Double): Double =
        if (off == w.length) acc
        else (1 to math.min(SentencePiece.MaxPiece, w.length - off)).flatMap { l =>
          scores.get(w.substring(off, off + l)).map(sc => enum(off + l, acc + sc))
        }.foldLeft(Double.NegativeInfinity)(math.max)
      assert(enum(0, 0.0) <= s.score + 1e-12,
        s"'$w': enumeration beats viterbi (${enum(0, 0.0)} vs ${s.score})")
    }
    // pinned tie-break: equal-score paths pick fewer pieces, then the
    // lexicographically smaller space-joined sequence
    val tied = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0, "ba" -> -2.0)
    assert(SentencePiece.viterbi("ab", tied).pieces == Vector("ab"),
      "fewer-pieces tie-break violated")
    val lex = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -3.0, "c" -> -1.0)
    assert(SentencePiece.viterbi("abc", lex).pieces == Vector("a", "b", "c"))
    // unknown character: whole word collapses to [UNK] at the pinned score
    val u = SentencePiece.viterbi("ax9", scores)
    assert(u.pieces == Vector(SentencePiece.Unk) && u.score == SentencePiece.UnkScore)
    // truncation: words beyond MaxWordLen segment their 12-char prefix
    val longW = "a" * 20
    assert(SentencePiece.viterbi(longW, scores).pieces.mkString("") == "a" * 12)
  }

  test("streaming ingest with the frozen artifact == batch segmentation, bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = SentencePiece.segmentDocs(
        mem.toDF().toDF("doc_id", "text"), "text", graft.SparkEntry.SentencePieceScores)
      .select(col("doc_id"), col("n_pieces"), col("sp_score"), col("head_pieces"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sp_out").start()
    try {
      for (chunk <- rows.grouped((rows.size + 2) / 3)) {
        mem.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("sp_out").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getString(3)))).toMap
      assert(streamed.size == rows.size)
      val batch = SentencePiece.segmentDocs(docs, "text", graft.SparkEntry.SentencePieceScores)
        .select(col("doc_id"), col("n_pieces"), col("sp_score"), col("head_pieces"))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getString(3)))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
