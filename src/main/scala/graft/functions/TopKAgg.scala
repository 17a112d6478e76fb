package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate for a bounded per-group top-k. */
final case class ScoredId(score: Long, id: Long)

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
    if (buf.length == k && !beats(x, buf.last)) buf
    else {
      val i = buf.indexWhere(beats(x, _)) match {
        case -1 => buf.length
        case j  => j
      }
      val ins = (buf.take(i) :+ x) ++ buf.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    // bounded merge of two sorted runs
    val out = Vector.newBuilder[ScoredId]
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

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAgg {
  /** Register as `top_k_<k>` and return the aggregate column: the
    * group's top-k (score DESC, id ASC) as an array of
    * {score, id} structs, best first. */
  def top_k(spark: SparkSession, score: Column, id: Column, k: Int): Column = {
    val name = s"top_k_$k"
    spark.udf.register(name, udaf(new TopKAgg(k), Encoders.product[ScoredId]))
    org.apache.spark.sql.functions.call_function(name, score, id)
  }
}
