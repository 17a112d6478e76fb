package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece semantics pinned independently of the DuckDB oracle:
  * greedy LONGEST-match-first, '##' continuations, the all-or-nothing
  * [UNK] rule, and the corpus-level invariant that q148's n_unk counts
  * exactly the occurrences of the vocabulary's deliberate coverage
  * hole ("slow"). */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("greedy longest-match-first beats shorter decompositions") {
    val v = Set("ab", "abc", "##d", "##cd")
    // "abc" (len 3) must win over "ab" + "##cd"
    assert(WordPiece.encodeWord("abcd", v, maxPiece = 3, maxWordLen = 16) ==
      Seq("abc", "##d"))
  }

  test("all-or-nothing: any unmatchable remainder collapses the word to [UNK]") {
    val v = Set("ab", "##c")
    assert(WordPiece.encodeWord("abx", v, 2, 16) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("xab", v, 2, 16) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("abc", v, 2, 16) == Seq("ab", "##c"))
  }

  test("continuation pieces require the ## form; word-initial the raw form") {
    val v = Set("ab", "##ab")
    assert(WordPiece.encodeWord("abab", v, 2, 16) == Seq("ab", "##ab"))
    // no raw piece for the initial position -> [UNK] even though ##ab exists
    val v2 = Set("##ab")
    assert(WordPiece.encodeWord("abab", v2, 2, 16) == Seq(WordPiece.Unk))
  }

  test("words over maxWordLen become [UNK] outright (oracle recursion bound)") {
    val v = Set("a", "##a")
    assert(WordPiece.encodeWord("a" * 17, v, 1, 16) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("a" * 16, v, 1, 16).length == 16)
  }

  test("sf0.001 corpus: n_unk == occurrences of the coverage hole; pieces reassemble") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q148_wordpiece")(spark, dir).collect()
    assert(rows.length > 0)
    val unkTotal = rows.map(_.getInt(2).toLong).sum
    val slowCount = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(filter(split(col("text"), " "), w => w === "slow")).as("n"))
      .collect().map(_.getInt(0).toLong).sum
    assert(unkTotal == slowCount,
      s"[UNK] total $unkTotal != 'slow' occurrences $slowCount")
    assert(rows.exists(_.getInt(2) > 0), "no [UNK] exercised on real rows")
    // stripping '##' and [UNK]-substituting must reassemble each doc's
    // first words — segmentation is lossless modulo the UNK rule
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    for (r <- rows.take(50)) {
      val head = r.getString(3).split(" ").toSeq
      val rebuilt = head.foldLeft(Seq.empty[String]) {
        case (acc, p) if p.startsWith("##") => acc.init :+ (acc.last + p.drop(2))
        case (acc, p) => acc :+ p
      }
      val words = graft.Tok.Pattern.r.findAllIn(docs(r.getLong(0))).toSeq
      for ((rb, w) <- rebuilt.init.zip(words)) // last may be a partial word (10-piece cut)
        assert(rb == w || rb == WordPiece.Unk && w == "slow",
          s"doc ${r.getLong(0)}: rebuilt '$rb' vs word '$w'")
    }
  }
}
