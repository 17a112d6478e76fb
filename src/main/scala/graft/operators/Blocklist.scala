package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-pattern exact substring matching via an Aho-Corasick automaton
 * (Aho & Corasick 1975) — the banned-phrase / blocklist filter of a
 * pretraining ingest pipeline. ONE pass over each document finds every
 * occurrence of every pattern simultaneously; the alternative (one
 * `contains` scan per pattern) is O(P) passes and dies at blocklist
 * sizes in the tens of thousands.
 *
 * Scale shape: the automaton is built once on the driver (size ~ total
 * pattern characters), broadcast, and applied scan-side — no shuffle,
 * no explode; the output is one row per (doc, matched pattern), sparse
 * by construction.
 *
 * Match semantics: every occurrence at every end position is counted
 * (the automaton's dictionary-suffix links report patterns that end
 * inside other matches too). For patterns with no proper border
 * (no self-overlap) this equals the non-overlapping count DuckDB's
 * replace() formula computes — the oracle pins its patterns
 * accordingly.
 */
object Blocklist {

  /** Immutable automaton: goto as dense child maps, fail links, and
    * per-node output pattern ids (via dictionary-suffix chains,
    * precompressed into each node's output list). */
  final class Automaton private[Blocklist] (
      val next: Array[Map[Char, Int]],
      val fail: Array[Int],
      val out: Array[List[Int]],
      val patterns: Seq[String]) extends Serializable

  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size, "duplicate pattern")
    val next = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    for ((p, pid) <- patterns.zipWithIndex) {
      var node = 0
      for (ch <- p) {
        next(node).get(ch) match {
          case Some(n) => node = n
          case None =>
            next += Map.empty[Char, Int]
            outB += Nil
            next(node) = next(node) + (ch -> (next.length - 1))
            node = next.length - 1
        }
      }
      outB(node) = pid :: outB(node)
    }
    // BFS fail links; outputs absorb the fail target's outputs so each
    // node carries its full dictionary-suffix set
    val fail = new Array[Int](next.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for ((_, c) <- next(0)) { fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((ch, v) <- next(u)) {
        var f = fail(u)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(v) = if (f != u && next(f).contains(ch)) next(f)(ch) else 0
        outB(v) = outB(v) ::: outB(fail(v))
        queue += v
      }
    }
    new Automaton(next.toArray, fail, outB.toArray, patterns)
  }

  /** Per-pattern occurrence counts for one text (every end position). */
  def scan(ac: Automaton, text: String): Array[Int] = {
    val counts = new Array[Int](ac.patterns.size)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !ac.next(node).contains(ch)) node = ac.fail(node)
      node = ac.next(node).getOrElse(ch, 0)
      var o = ac.out(node)
      while (o.nonEmpty) { counts(o.head) += 1; o = o.tail }
      i += 1
    }
    counts
  }

  /** One row per (doc, matched pattern): `(idCol, pattern, hits)`. */
  def matches(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val ac = build(patterns)
    val bc = df.sparkSession.sparkContext.broadcast(ac)
    val hit = udf { text: String =>
      if (text == null) Seq.empty[(String, Int)]
      else {
        val counts = scan(bc.value, text)
        bc.value.patterns.zipWithIndex.collect {
          case (p, i) if counts(i) > 0 => (p, counts(i))
        }
      }
    }
    df.select(col(idCol), explode(hit(col(textCol))).as("m"))
      .select(col(idCol), col("m._1").as("pattern"), col("m._2").as("hits"))
  }
}
