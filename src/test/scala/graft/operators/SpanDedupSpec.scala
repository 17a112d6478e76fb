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

  test("overlapping windows with a position gap merge into ONE non-overlapping span") {
    // doc A = "a b c d e"; B holds "a b c", C holds "c d e": A's
    // duplicated window starts are {0, 2} (gap 2 < window 3). The old
    // consecutive-only islands emitted spans [0,2] and [2,4], which
    // OVERLAP at token 2; the contract is one maximal span [0,4].
    val got = spans(Seq(
      1L -> "a b c d e",
      2L -> "x1 x2 a b c x3",
      3L -> "y1 c d e y2 y3"), window = 3)
    val aSpans = got.filter(_._1 == 1L)
    assert(aSpans == Set((1L, 0L, 4L, 2L)), s"got $aSpans")
    // spans within one doc never overlap, corpus-wide property
    for ((id, ss) <- got.groupBy(_._1)) {
      val sorted = ss.toSeq.sortBy(_._2)
      for (Seq(p, n) <- sorted.sliding(2) if sorted.length > 1)
        assert(p._3 < n._2, s"doc $id: span $p overlaps $n")
    }
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
    val byDoc = dupStarts.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every span: boundaries are duplicated starts, n_windows counts
    // the duplicated starts inside, spans per doc are disjoint, and
    // merged starts are never more than `window` apart (else they
    // would be separate spans)
    var covered = Set.empty[(Long, Int)]
    for ((id, s, e, n) <- got) {
      val ds = byDoc(id)
      assert(ds.contains(s.toInt), s"span start $s of doc $id is not a duplicated start")
      assert(ds.contains((e - window + 1).toInt), s"span end $e of doc $id misaligned")
      val inSpan = ds.filter(p => p >= s && p <= e - window + 1).toSeq.sorted
      assert(inSpan.size == n, s"span ($id,$s,$e) claims $n windows, has ${inSpan.size}")
      for (Seq(a, b) <- inSpan.sliding(2) if inSpan.length > 1)
        assert(b - a <= window, s"doc $id: starts $a,$b should not share a span")
      covered ++= inSpan.map(p => (id, p))
    }
    // every duplicated start lands in exactly one span (disjointness +
    // coverage together: the union reconstructs the brute-force set)
    assert(covered == dupStarts)
    for ((id, ss) <- got.groupBy(_._1)) {
      val sorted = ss.toSeq.sortBy(_._2)
      for (Seq(p, nx) <- sorted.sliding(2) if sorted.length > 1)
        assert(p._3 < nx._2, s"doc $id: span $p overlaps $nx")
    }
  }
}
