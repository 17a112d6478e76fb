package graft.operators

import graft.Tok
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
    * original algorithm (distinguishes "est</w>" from "est").
    *
    * The sentinel is RESERVED: a word whose text contains the literal
    * "</w>" would make the emitted token stream ambiguous (word
    * boundary indistinguishable from content), so [[trainFromVocab]]
    * and [[encodeWord]] reject such words loudly rather than corrupt
    * the roundtrip. Public BPE implementations avoid this class of
    * collision with byte-level alphabets; a pre-pass stripping or
    * escaping the sentinel is the caller's lever for corpora where it
    * occurs. */
  val EndOfWord = "</w>"

  type Merge = (String, String)

  // ------------------------------------------------------------------
  // Byte-level alphabet (the GPT-2 `bytes_to_unicode` construction):
  // a bijection from the 256 byte values onto 256 PRINTABLE chars —
  // printable latin-1 ranges map to themselves, the 68 remaining bytes
  // (controls, space, DEL, soft hyphen, ...) map to U+0100 + n. Words
  // are first re-spelled in this closed alphabet, so the base vocab is
  // exactly 256 symbols, ANY UTF-8 string is representable (no OOV
  // character can be dropped), and the end-of-word sentinel can be a
  // char OUTSIDE the alphabet — immune to the "word contains '</w>'"
  // collision the char-level mode must reject.

  /** byte value -> alphabet char (bijective). */
  val ByteAlphabet: Array[Char] = {
    val printable = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      if (printable(b)) b.toChar
      else { val c = (0x100 + n).toChar; n += 1; c }
    }
  }
  private lazy val byteUnmap: Map[Char, Int] =
    ByteAlphabet.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** End-of-word sentinel for byte-level mode: a char outside the
    * 256-char alphabet by construction, so NO input word — including
    * one containing the literal "</w>" — can collide with it. */
  val ByteSentinel = "␀" // ␀ SYMBOL FOR NULL

  /** Re-spell a word in the byte alphabet (UTF-8 bytes, mapped). */
  def byteWord(word: String): String = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length)
    var i = 0
    while (i < bs.length) { sb.append(ByteAlphabet(bs(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Inverse of [[byteWord]] (sentinel chars must be stripped first). */
  def unByteWord(s: String): String = {
    val bs = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bs(i) = byteUnmap.getOrElse(s.charAt(i),
        sys.error(s"char '${s.charAt(i)}' is not in the byte alphabet")).toByte
      i += 1
    }
    new String(bs, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Decode a byte-level token stream back to the exact words: symbols
    * concatenate until one ends with the sentinel (= word boundary). */
  def decodeByteTokens(tokens: Seq[String]): IndexedSeq[String] = {
    val words = IndexedSeq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    tokens.foreach { t =>
      if (t.endsWith(ByteSentinel)) {
        cur.append(t, 0, t.length - ByteSentinel.length)
        words += unByteWord(cur.toString)
        cur.setLength(0)
      } else cur.append(t)
    }
    require(cur.length == 0, "byte-level token stream ends mid-word (sentinel missing)")
    words.result()
  }

  /** Train `numMerges` merges from a word-frequency vocab. Pure local
    * function of the vocab — the distributed side is [[wordCounts]].
    *
    * Incremental, as the reference trainers are: pair counts and a
    * pair->words inverted index are built ONCE; each merge touches
    * only the words that actually contain the winning pair (updating
    * adjacent-pair counts in place), so the loop is O(affected words)
    * per merge, not a full vocab rescan — the difference between
    * milliseconds and minutes of driver CPU at an open-vocabulary
    * `maxVocab`.
    */
  def trainFromVocab(vocab: Map[String, Long], numMerges: Int,
      sentinel: String = EndOfWord): IndexedSeq[Merge] = {
    require(vocab.keys.forall(w => !w.contains(sentinel)),
      s"vocab contains the reserved end-of-word sentinel '$sentinel'")
    // word -> symbol sequence (chars, last char + sentinel); sorted for
    // a deterministic index order
    val words: Array[Array[String]] = vocab.keys.toArray.sorted.map { w =>
      val chars = w.map(_.toString).toArray
      chars(chars.length - 1) += sentinel
      chars
    }
    val freq: Array[Long] = {
      val sortedKeys = vocab.keys.toArray.sorted
      sortedKeys.map(vocab)
    }
    val pairCounts = scala.collection.mutable.Map.empty[Merge, Long]
    val pairWords = scala.collection.mutable.Map.empty[Merge, scala.collection.mutable.Set[Int]]
    def addPair(p: Merge, wi: Int, c: Long): Unit = {
      pairCounts.updateWith(p)(v => Some(v.getOrElse(0L) + c).filter(_ != 0L))
      if (pairCounts.contains(p))
        pairWords.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
      else pairWords.remove(p)
    }
    for (wi <- words.indices; j <- 0 until words(wi).length - 1)
      addPair((words(wi)(j), words(wi)(j + 1)), wi, freq(wi))

    val merges = IndexedSeq.newBuilder[Merge]
    var i = 0
    while (i < numMerges && pairCounts.nonEmpty) {
      // max count, ties broken lexicographically -> deterministic
      val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      val joined = best._1 + best._2
      val affected = pairWords.getOrElse(best, Set.empty[Int]).toArray.sorted
      for (wi <- affected) {
        val syms = words(wi)
        val c = freq(wi)
        // retract the word's current adjacent pairs...
        for (j <- 0 until syms.length - 1) addPair((syms(j), syms(j + 1)), wi, -c)
        // ...apply the merge...
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == best._1 && syms(j + 1) == best._2) {
            out += joined; j += 2
          } else { out += syms(j); j += 1 }
        }
        words(wi) = out.result()
        // ...and re-add the rewritten word's pairs
        val ns = words(wi)
        for (j2 <- 0 until ns.length - 1) addPair((ns(j2), ns(j2 + 1)), wi, c)
      }
      pairCounts.remove(best)
      pairWords.remove(best)
      i += 1
    }
    merges.result()
  }

  /** Distributed word-frequency vocab: one explode + one keyed
    * aggregate; `maxVocab` caps the driver-side collect by keeping the
    * most frequent words (ties by word — deterministic), which is how
    * public BPE trainers bound memory on open vocabularies. */
  def wordCounts(df: DataFrame, textCol: String, maxVocab: Int): DataFrame =
    df.select(explode(split(trim(col(textCol)), Tok.WsPlus)).as("w"))
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
  def encodeWord(word: String, ranks: Map[Merge, Int],
      sentinel: String = EndOfWord): IndexedSeq[String] = {
    if (word.isEmpty) return IndexedSeq.empty
    require(!word.contains(sentinel),
      s"word contains the reserved end-of-word sentinel '$sentinel': $word")
    val chars = word.map(_.toString).toIndexedSeq
    var syms = chars.init :+ (chars.last + sentinel)
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

  // ----------------------------------------------------- byte level

  /** Byte-level training: the vocab's words are re-spelled in the
    * closed 256-char byte alphabet before the merge loop, so merges
    * are over byte symbols (GPT-2 style) and ANY UTF-8 word — however
    * exotic, including ones containing the literal char-level sentinel
    * — trains and encodes without rejection. */
  def trainBytesFromVocab(vocab: Map[String, Long], numMerges: Int): IndexedSeq[Merge] =
    trainFromVocab(vocab.map { case (w, c) => byteWord(w) -> c }, numMerges, ByteSentinel)

  /** Byte-level corpus training: distributed vocab -> local merges. */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 20): IndexedSeq[Merge] = {
    val vocab = wordCounts(df, textCol, maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trainBytesFromVocab(vocab, numMerges)
  }

  /** Byte-level word encode: never fails, never drops a character —
    * [[decodeByteTokens]] inverts the stream exactly. */
  def encodeWordBytes(word: String, ranks: Map[Merge, Int]): IndexedSeq[String] =
    encodeWord(byteWord(word), ranks, ByteSentinel)

  /** Byte-level DataFrame encode — same broadcast + scan-side shape as
    * [[encode]]. */
  def encodeBytes(df: DataFrame, textCol: String, merges: IndexedSeq[Merge],
      outCol: String = "tokens"): DataFrame = {
    val spark = df.sparkSession
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val enc = udf { text: String =>
      if (text == null) null
      else graft.functions.HashExprs.tokenize(text)
        .flatMap(w => encodeWordBytes(w, bc.value)).toSeq
    }
    df.withColumn(outCol, enc(col(textCol)))
  }
}
