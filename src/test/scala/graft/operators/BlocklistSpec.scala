package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Aho-Corasick semantics pinned independently of the DuckDB oracle:
  * every occurrence at every end position, dictionary-suffix reporting
  * (patterns ending inside other matches), bordered-pattern overlap
  * counting, and equality with a naive per-pattern scan. */
class BlocklistSpec extends AnyFunSuite {

  private def counts(patterns: Seq[String], text: String): Map[String, Int] = {
    val ac = Blocklist.build(patterns)
    patterns.zip(Blocklist.scan(ac, text)).toMap
  }

  test("all occurrences at all end positions, including inside other matches") {
    val c = counts(Seq("he", "she", "his", "hers"), "ushers")
    // "ushers": she@1..3, he@2..3, hers@2..5
    assert(c == Map("he" -> 1, "she" -> 1, "his" -> 0, "hers" -> 1))
  }

  test("bordered patterns count OVERLAPPING occurrences (unlike replace())") {
    val c = counts(Seq("aa"), "aaaa")
    assert(c("aa") == 3) // positions 0,1,2 — replace() would count 2
  }

  test("equality with a naive all-positions scan on random text") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("ab", "ba", "aab", "bb", "aba")
    val ac = Blocklist.build(pats)
    for (_ <- 1 to 200) {
      val text = Array.fill(rnd.nextInt(40) + 1)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = Blocklist.scan(ac, text)
      val want = pats.map(p =>
        (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)))
      assert(got.toSeq == want, s"text=$text got=${got.toSeq} want=$want")
    }
  }

  test("q151's pinned phrases are borderless (oracle replace() arithmetic valid)") {
    for (p <- graft.SparkEntry.BlocklistPhrases; b <- 1 until p.length)
      assert(!(p.substring(0, b) == p.substring(p.length - b)),
        s"phrase '$p' has a border of length $b — overlap counts would diverge")
  }
}
