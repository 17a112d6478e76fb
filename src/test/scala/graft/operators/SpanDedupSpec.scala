package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], window: Int): Set[(Long, Long, Long, Long)] =
    SpanDedup.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", window)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("planted cross-doc repeat is found with exact bounds, unique text is not") {
    // 12-token repeated block inside otherwise-unique 30-token docs
    val block = (0 until 12).map(i => s"dup$i").mkString(" ")
    def doc(id: Int, lead: Int) = {
      val pre = (0 until lead).map(i => s"u${id}_$i").mkString(" ")
      val post = (0 until (30 - lead - 12)).map(i => s"v${id}_$i").mkString(" ")
      s"$pre $block $post"
    }
    val got = spans(Seq(1L -> doc(1, 5), 2L -> doc(2, 9), 3L -> doc(3, 0)), window = 4)
    // windows of 4 inside a 12-token block starting at `lead`: starts
    // lead..lead+8 -> span [lead, lead+11], 9 windows
    assert(got == Set(
      (1L, 5L, 16L, 9L),
      (2L, 9L, 20L, 9L),
      (3L, 0L, 11L, 9L)))
  }

  test("corpus with no repeated windows yields no spans") {
    val docs = (1 to 5).map(d => d.toLong -> (0 until 20).map(i => s"w${d}_$i").mkString(" "))
    assert(spans(docs, window = 4).isEmpty)
  }

  test("within-doc repetition counts as duplication") {
    val phrase = "a b c d e"
    val doc = s"$phrase x1 x2 x3 $phrase"
    // tokens: 0..4 phrase, 5..7 unique, 8..12 phrase
    val got = spans(Seq(1L -> doc), window = 5)
    assert(got == Set((1L, 0L, 4L, 1L), (1L, 8L, 12L, 1L)))
  }

  test("adjacent duplicated windows merge into one maximal span") {
    // two docs identical end-to-end: every window duplicated, one span each
    val text = (0 until 25).map(i => s"t$i").mkString(" ")
    val got = spans(Seq(1L -> text, 2L -> text), window = 8)
    assert(got == Set((1L, 0L, 24L, 18L), (2L, 0L, 24L, 18L)))
  }

  test("docs shorter than the window produce nothing (and don't error)") {
    assert(spans(Seq(1L -> "only three tokens", 2L -> "only three tokens"), window = 8).isEmpty)
  }

  private def excised(docs: Seq[(Long, String)], window: Int): Map[Long, (String, Long)] =
    SpanDedup.exciseSpans(docs.toDF("doc_id", "text"), "doc_id", "text", window)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("excision keeps the first corpus occurrence, removes later restatements") {
    val block = (0 until 12).map(i => s"dup$i").mkString(" ")
    val d1 = s"head1 a b $block tail1"
    val d2 = s"head2 $block tail2 x y"
    val d3 = block // entirely the repeated block
    val got = excised(Seq(1L -> d1, 2L -> d2, 3L -> d3), window = 4)
    assert(got(1L) == (d1, 0L)) // canonical copy untouched
    assert(got(2L) == ("head2 tail2 x y", 12L))
    assert(got(3L) == ("", 12L))
  }

  test("excision is identity (modulo whitespace normalization) without duplicates") {
    val docs = (1 to 4).map(d => d.toLong -> (0 until 15).map(i => s"w${d}_$i").mkString("  "))
    val got = excised(docs, window = 4)
    for ((id, text) <- docs)
      assert(got(id) == (text.split("\\s+").mkString(" "), 0L))
  }

  test("within-doc repetition keeps only the first in-doc occurrence") {
    val phrase = "p0 p1 p2 p3 p4"
    val doc = s"$phrase mid1 mid2 $phrase"
    val got = excised(Seq(1L -> doc), window = 5)
    assert(got(1L) == (s"$phrase mid1 mid2", 5L))
  }

  test("property: rebuilt spans cover exactly the duplicated window starts") {
    val rnd = new scala.util.Random(7)
    // random docs over a tiny vocab => natural window collisions
    val docs = (1 to 30).map { d =>
      d.toLong -> (0 until 40).map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
    }
    val window = 3
    val got = spans(docs, window)
    // brute-force reference: count window strings globally
    val wins = docs.flatMap { case (id, text) =>
      val t = text.split(" ")
      (0 to t.length - window).map(p => (id, p, t.slice(p, p + window).mkString(" ")))
    }
    val dupStrings = wins.groupBy(_._3).filter(_._2.size > 1).keySet
    val dupStarts = wins.filter(w => dupStrings.contains(w._3)).map(w => (w._1, w._2)).toSet
    // expand spans back to window starts
    val rebuilt = got.flatMap { case (id, s, e, n) =>
      val starts = (s to (e - window + 1)).map(p => (id, p.toInt))
      assert(starts.size == n, s"span ($id,$s,$e) claims $n windows, has ${starts.size}")
      starts
    }.map { case (id, p) => (id, p) }
    assert(rebuilt == dupStarts.map { case (id, p) => (id, p) })
  }
}
