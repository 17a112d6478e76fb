package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair encoding, the real thing (Sennrich et al. 2016,
 * arXiv:1508.07909): train a merge table on the corpus, then encode
 * text with it. ([[TextOps.bpeTokenCount]] is the one-regex *proxy*
 * used for cheap budgeting; this operator produces actual subword
 * tokens.)
 *
 * Scale shape — the same discipline as k-means centroids and the
 * Bloom sketch: corpus-sized work is distributed (ONE aggregation
 * builds the word-frequency vocab), vocab-sized work runs on the
 * driver (the merge loop touches only the vocab, which is orders of
 * magnitude smaller than the corpus and bounded by `maxVocab`), and
 * the resulting merge table ships back as a broadcast for the
 * embarrassingly-parallel encode pass. The corpus text itself never
 * shuffles and is read once per pass.
 *
 * Determinism: ties in pair frequency break lexicographically, so the
 * merge table is a pure function of the word-frequency map.
 */
object Bpe {

  /** End-of-word sentinel appended to each word's last symbol, per the
    * original algorithm (distinguishes "est</w>" from "est"). */
  val EndOfWord = "</w>"

  type Merge = (String, String)

  /** Train `numMerges` merges from a word-frequency vocab. Pure local
    * function of the vocab — the distributed side is [[wordCounts]]. */
  def trainFromVocab(vocab: Map[String, Long], numMerges: Int): IndexedSeq[Merge] = {
    // word -> symbol sequence (chars, last char + </w>)
    var words: Map[IndexedSeq[String], Long] = vocab.map { case (w, c) =>
      val chars = w.map(_.toString).toIndexedSeq
      (chars.init :+ (chars.last + EndOfWord), c)
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val merges = IndexedSeq.newBuilder[Merge]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[Merge, Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(j), syms(j + 1)))(p => Some(p.getOrElse(0L) + c))
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties broken lexicographically -> deterministic
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          val out = IndexedSeq.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += joined; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    merges.result()
  }

  /** Distributed word-frequency vocab: one explode + one keyed
    * aggregate; `maxVocab` caps the driver-side collect by keeping the
    * most frequent words (ties by word — deterministic), which is how
    * public BPE trainers bound memory on open vocabularies. */
  def wordCounts(df: DataFrame, textCol: String, maxVocab: Int): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)

  /** Train on a corpus: distributed vocab -> local merge loop. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 20): IndexedSeq[Merge] = {
    val vocab = wordCounts(df, textCol, maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trainFromVocab(vocab, numMerges)
  }

  /** Encode one word with the merge table (ranks = merge priority:
    * always apply the LOWEST-rank applicable merge first, as the
    * original algorithm and every public implementation do). */
  def encodeWord(word: String, ranks: Map[Merge, Int]): IndexedSeq[String] = {
    if (word.isEmpty) return IndexedSeq.empty
    val chars = word.map(_.toString).toIndexedSeq
    var syms = chars.init :+ (chars.last + EndOfWord)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) continue = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Add a `tokens` (array<string>) column: per-word BPE subwords, in
    * word order. The merge table travels as a broadcast; the encode is
    * a scan-side map with no shuffle. */
  def encode(df: DataFrame, textCol: String, merges: IndexedSeq[Merge],
      outCol: String = "tokens"): DataFrame = {
    val spark = df.sparkSession
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val enc = udf { text: String =>
      if (text == null) null
      else graft.functions.HashExprs.tokenize(text)
        .flatMap(w => encodeWord(w, bc.value)).toSeq
    }
    df.withColumn(outCol, enc(col(textCol)))
  }
}
