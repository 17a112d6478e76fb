package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WordPiece tokenization — the BERT-family counterpart of [[Bpe]]:
 * greedy LONGEST-match-first segmentation of each word against a fixed
 * vocabulary, continuation pieces carrying the `##` prefix, and the
 * all-or-nothing failure rule (a word with any unmatchable remainder
 * becomes one `[UNK]` token — original WordPiece semantics, Wu et al.
 * 2016 / BERT's tokenizer).
 *
 * Scale shape: the vocabulary is broadcast once and each document is
 * segmented scan-side (one UDF pass, no shuffle, no per-word explode);
 * at 100 TB this is a pure map stage like the BPE encoder.
 *
 * Determinism: greedy longest-match is a pure function of
 * (word, vocab); ties are impossible (a set holds one piece per
 * string). The DuckDB oracle restates the same scan as a WITH
 * RECURSIVE peel, one piece per iteration.
 */
object WordPiece {

  val Unk = "[UNK]"

  /** Greedy longest-prefix segmentation of one word. Words longer than
    * `maxWordLen` become `[UNK]` outright (bounds the oracle's
    * recursion depth identically). */
  def encodeWord(w: String, vocab: Set[String], maxPiece: Int,
      maxWordLen: Int): Seq[String] = {
    if (w.isEmpty) return Nil
    if (w.length > maxWordLen) return Seq(Unk)
    val out = Seq.newBuilder[String]
    var off = 0
    while (off < w.length) {
      val cont = off > 0
      var len = math.min(maxPiece, w.length - off)
      var hit: String = null
      while (len >= 1 && hit == null) {
        val cand = (if (cont) "##" else "") + w.substring(off, off + len)
        if (vocab.contains(cand)) hit = cand
        else len -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      off += len
    }
    out.result()
  }

  /** Adds `outCol` = the flattened piece sequence of the whitespace
    * words of `textCol` (graft.Tok.Pattern words, the cross-engine
    * tokenizer), each word independently segmented. */
  def withPieces(df: DataFrame, textCol: String, outCol: String,
      vocab: Seq[String], maxWordLen: Int = 16): DataFrame = {
    val maxPiece = vocab.map(p => p.stripPrefix("##").length).max
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toSet)
    val enc = udf { words: Seq[String] =>
      if (words == null) Seq.empty[String]
      else words.flatMap(w => encodeWord(w, bc.value, maxPiece, maxWordLen))
    }
    df.withColumn(outCol, enc(
      call_function("regexp_extract_all", col(textCol), lit(graft.Tok.Pattern), lit(0))))
  }
}
