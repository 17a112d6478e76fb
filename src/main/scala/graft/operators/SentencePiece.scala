package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SentencePiece-style UNIGRAM-LM tokenization (Kudo 2018) — the
 * Llama/T5 tokenizer family, completing the production trio beside
 * [[Bpe]] (GPT family) and [[WordPiece]] (BERT family).
 *
 * Model: a frozen table of piece log-probabilities; segmentation of a
 * word is the VITERBI argmax over all decompositions into vocabulary
 * pieces (maximize the sum of piece scores). Training is hard-EM with
 * Viterbi counts: seed candidates = every substring of length <=
 * `maxPiece` ranked by corpus frequency (every single character kept
 * for coverage), initial scores = log relative frequency, then
 * repeatedly {segment every distinct word under the current scores,
 * re-estimate scores from the piece counts with +0.5 smoothing}.
 *
 * Scale shape (the [[Bpe]] discipline): every corpus pass is a
 * distributed aggregation over the distinct-word table; only
 * capped, vocabulary-sized tables ever reach the driver (candidate
 * top-k via orderBy+limit = TakeOrderedAndProject, per-iteration piece
 * counts bounded by the vocabulary size). Application is one
 * scan-side UDF pass over broadcast scores — no shuffle, no explode.
 *
 * Determinism: Viterbi ties (exact f64 score equality) break to the
 * FEWER-piece path, then the lexicographically smaller space-joined
 * piece sequence — a total order the DuckDB oracle restates as
 * `ORDER BY score DESC, np ASC, path ASC`. The f64 path score
 * accumulates left-to-right on both engines, so equal paths carry
 * bit-identical scores.
 */
object SentencePiece {

  val MaxPiece = 4
  val MaxWordLen = 12
  val Unk = "[UNK]"
  val UnkScore: Double = -20.0

  /** One word's Viterbi segmentation: pieces + total log-prob. */
  final case class Seg(pieces: IndexedSeq[String], score: Double)

  /** Viterbi argmax segmentation of `w0` (truncated to `maxWordLen`)
    * under `scores`; a word containing any character outside the
    * vocabulary collapses to one `[UNK]` at [[UnkScore]] (single-char
    * coverage makes this unreachable for corpus-trained models, but
    * the rule is part of the cross-engine contract). */
  def viterbi(w0: String, scores: collection.Map[String, Double],
      maxPiece: Int = MaxPiece, maxWordLen: Int = MaxWordLen): Seg = {
    val w = if (w0.length > maxWordLen) w0.substring(0, maxWordLen) else w0
    val n = w.length
    if (n == 0) return Seg(Vector.empty, 0.0)
    // best(p) = (score, nPieces, path) over segmentations of w[0, p)
    val bScore = new Array[Double](n + 1)
    val bN = new Array[Int](n + 1)
    val bPath = new Array[Vector[String]](n + 1)
    bPath(0) = Vector.empty
    var pos = 1
    while (pos <= n) {
      var len = 1
      val maxL = math.min(maxPiece, pos)
      while (len <= maxL) {
        val prev = pos - len
        if (bPath(prev) != null) {
          val piece = w.substring(prev, pos)
          scores.get(piece) match {
            case Some(s) =>
              val cs = bScore(prev) + s // left-to-right f64 accumulation
              val cn = bN(prev) + 1
              val better =
                if (bPath(pos) == null) true
                else if (cs != bScore(pos)) cs > bScore(pos)
                else if (cn != bN(pos)) cn < bN(pos)
                else (bPath(prev) :+ piece).mkString(" ") < bPath(pos).mkString(" ")
              if (better) {
                bScore(pos) = cs; bN(pos) = cn; bPath(pos) = bPath(prev) :+ piece
              }
            case None =>
          }
        }
        len += 1
      }
      pos += 1
    }
    if (bPath(n) == null) Seg(Vector(Unk), UnkScore)
    else Seg(bPath(n), bScore(n))
  }

  /** Distinct corpus words with counts, truncated to `maxWordLen`
    * (truncation BEFORE the count merge so both engines see one row
    * per truncated form). */
  private def wordCounts(df: DataFrame, textCol: String, maxWordLen: Int,
      maxVocab: Int): DataFrame =
    df.select(explode(split(trim(col(textCol)), graft.Tok.WsPlus)).as("w0"))
      .filter(length(col("w0")) > 0)
      .select(substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)

  /** Hard-EM unigram training; returns the frozen (piece, logProb)
    * table sorted by piece. `vocabSize` bounds the MULTI-char piece
    * count; every single character survives for coverage (capped at
    * `maxChars` — a corpus with more distinct characters than that is
    * not a word corpus). */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 64,
      maxPiece: Int = MaxPiece, maxWordLen: Int = MaxWordLen, iters: Int = 2,
      maxVocab: Int = 1 << 20, maxChars: Int = 4096): Array[(String, Double)] = {
    val spark = df.sparkSession
    val wc = wordCounts(df, textCol, maxWordLen, maxVocab).cache()
    try {
      // candidate substring frequencies (with multiplicity), distributed
      val subs = udf { w: String =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxPiece, w.length - i)
        } yield w.substring(i, i + l)
      }
      val cand = wc.select(explode(subs(col("w"))).as("p"), col("c"))
        .groupBy("p").agg(sum("c").as("f"))
      val singles = cand.filter(length(col("p")) === 1)
        .orderBy(col("f").desc, col("p")).limit(maxChars)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val multis = cand.filter(length(col("p")) > 1)
        .orderBy(col("f").desc, col("p")).limit(vocabSize)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val kept: Array[(String, Long)] = (singles ++ multis).sortBy(_._1)
      val totalF = kept.map(_._2).sum.toDouble
      var scores: Map[String, Double] =
        kept.map { case (p, f) => p -> math.log(f.toDouble / totalF) }.toMap
      val pieces = kept.map(_._1) // fixed piece set across iterations
      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(scores)
        val segU = udf { w: String => viterbi(w, bc.value, maxPiece, maxWordLen).pieces }
        val counts: Map[String, Long] = wc
          .select(explode(segU(col("w"))).as("p"), col("c"))
          .groupBy("p").agg(sum("c").as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val total = counts.valuesIterator.sum.toDouble + 0.5 * pieces.length
        scores = pieces.map(p =>
          p -> math.log((counts.getOrElse(p, 0L).toDouble + 0.5) / total)).toMap
        it += 1
      }
      pieces.map(p => p -> scores(p))
    } finally { wc.unpersist(false) }
  }

  /** Adds per-document segmentation stats over `textCol`: `n_pieces`,
    * `sp_score` (f64 sum of word Viterbi scores in word order),
    * `head_pieces` (first `headN` pieces, space-joined) — one
    * scan-side UDF pass over the broadcast frozen scores. */
  def segmentDocs(df: DataFrame, textCol: String, scores: Seq[(String, Double)],
      headN: Int = 10): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(scores.toMap)
    val segU = udf { words: Seq[String] =>
      var n = 0
      var score = 0.0
      val head = Seq.newBuilder[String]
      if (words != null) for (w <- words) {
        val s = viterbi(w, bc.value)
        for (p <- s.pieces) { if (n < headN) head += p; n += 1 }
        score += s.score
      }
      (n, score, head.result().mkString(" "))
    }
    df.withColumn("__seg",
        segU(call_function("regexp_extract_all", col(textCol),
          lit(graft.Tok.Pattern), lit(0))))
      .withColumn("n_pieces", col("__seg._1"))
      .withColumn("sp_score", col("__seg._2"))
      .withColumn("head_pieces", col("__seg._3"))
      .drop("__seg")
  }
}
