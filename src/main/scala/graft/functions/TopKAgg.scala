package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate for a bounded per-group top-k. */
final case class ScoredId(score: Long, id: Long)

/** Double-scored candidate — model scores, similarities, ratios. */
final case class ScoredIdD(score: Double, id: Long)

/**
 * Bounded exact top-k per group as a typed mergeable `Aggregator`
 * (UDAF): the buffer is the current top-k, kept sorted by
 * (score DESC, id ASC — the deterministic tiebreak), never more than
 * `k` entries. `reduce` is an O(k) bounded insert, `merge` a bounded
 * sorted-merge, so partial aggregation sends at most k rows per
 * (map task × group) across the shuffle — never the row stream.
 *
 * This is the scale-correct shape for "cap each domain/source at its
 * N best documents": the window alternative
 * (`row_number() OVER (PARTITION BY source ORDER BY score)` + filter)
 * shuffles EVERY row into #sources partitions and sorts each
 * serially — with a handful of sources that is the same
 * low-cardinality serial shape the two-level prefix sum removed from
 * tokenBudgetSample/curriculumOrder, except here the full sort is not
 * even needed. With map-side combine the exchange carries
 * ≤ tasks × groups × k rows and the per-group reduce is O(tasks × k).
 *
 * Exactness: top-k under a total order is mergeable — the global
 * top-k of a union is contained in the union of per-part top-ks —
 * so the bounded buffers lose nothing (unlike the estimate-style
 * [[HeavyHittersAgg]]; this is the exact member of the family).
 */
class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] with Serializable {
  require(k >= 1, "k must be >= 1")

  // score DESC, id ASC
  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    TopKAgg.insert(buf, x, k, beats)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    TopKAgg.mergeRuns(a, b, k, beats)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

/**
 * Double-scored sibling of [[TopKAgg]] for model-quality / similarity
 * scores. Same bounded-buffer shape; the order is a TOTAL order with
 * an explicit NaN policy — NaN GREATEST (round-20, VERDICT r19 item 3):
 * both Spark and DuckDB sort NaN as the largest double, so a
 * `row_number() OVER (ORDER BY score DESC)` window — the construct this
 * aggregator replaces on the hot paths — ranks a NaN score FIRST. The
 * aggregator follows the same order so the replacement is equivalent
 * even when a NaN reaches it (zero-norm embeddings are the one real
 * source: cosine against them is 0/0). NaN-vs-NaN falls through to the
 * id ASC tiebreak. Without an explicit policy, `>` comparisons
 * involving NaN are all-false and the buffer order (hence merge
 * correctness) breaks. -0.0 == 0.0 ties break by id, matching SQL
 * DOUBLE comparison. (This deliberately DIFFERS from [[ArgMax]]'s
 * NaN-never-wins: ArgMax replaces explicit greatest-finite picks,
 * this replaces DESC windows.)
 */
class TopKAggD(k: Int)
    extends Aggregator[ScoredIdD, Seq[ScoredIdD], Seq[ScoredIdD]] with Serializable {
  require(k >= 1, "k must be >= 1")

  private def beats(a: ScoredIdD, b: ScoredIdD): Boolean = {
    val an = java.lang.Double.isNaN(a.score)
    val bn = java.lang.Double.isNaN(b.score)
    if (an || bn) { if (an && bn) a.id < b.id else an } // NaN greatest (sorts first DESC)
    else a.score > b.score || (a.score == b.score && a.id < b.id)
  }

  override def zero: Seq[ScoredIdD] = Vector.empty
  override def reduce(buf: Seq[ScoredIdD], x: ScoredIdD): Seq[ScoredIdD] =
    TopKAgg.insert(buf, x, k, beats)
  override def merge(a: Seq[ScoredIdD], b: Seq[ScoredIdD]): Seq[ScoredIdD] =
    TopKAgg.mergeRuns(a, b, k, beats)
  override def finish(buf: Seq[ScoredIdD]): Seq[ScoredIdD] = buf

  override def bufferEncoder: Encoder[Seq[ScoredIdD]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredIdD]]()
  override def outputEncoder: Encoder[Seq[ScoredIdD]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredIdD]]()
}

object TopKAgg {
  /** Bounded insert into a sorted top-k run — one builder pass, no
    * intermediate collections (this is per-row hot code). */
  private[functions] def insert[T](buf: Seq[T], x: T, k: Int,
      beats: (T, T) => Boolean): Seq[T] =
    if (buf.length == k && !beats(x, buf.last)) buf
    else {
      val b = Vector.newBuilder[T]
      b.sizeHint(math.min(buf.length + 1, k))
      var i = 0
      var n = 0
      var placed = false
      while (n < k && (i < buf.length || !placed)) {
        if (!placed && (i >= buf.length || beats(x, buf(i)))) { b += x; placed = true }
        else { b += buf(i); i += 1 }
        n += 1
      }
      b.result()
    }

  /** Bounded merge of two sorted runs. */
  private[functions] def mergeRuns[T](a: Seq[T], b: Seq[T], k: Int,
      beats: (T, T) => Boolean): Seq[T] = {
    val out = Vector.newBuilder[T]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && beats(a(i), b(j)))
      out += (if (takeA) { val v = a(i); i += 1; v }
              else { val v = b(j); j += 1; v })
      n += 1
    }
    out.result()
  }

  /** The group's top-k (score DESC, id ASC) as an array of {score, id}
    * structs, best first. Pure: the UDAF is applied directly as a
    * Column — nothing is registered in the session's function registry,
    * so building queries is side-effect-free and concurrency-safe. */
  def top_k(score: Column, id: Column, k: Int): Column =
    udaf(new TopKAgg(k), Encoders.product[ScoredId])(score, id)

  /** Double-scored variant (NaN never wins; see [[TopKAggD]]). */
  def top_k_d(score: Column, id: Column, k: Int): Column =
    udaf(new TopKAggD(k), Encoders.product[ScoredIdD])(score, id)
}
