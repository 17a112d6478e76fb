package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable moment buffer: count + per-dimension Σx and Σx². */
final case class VecStatsBuf(n: Long, sum: Array[Double], sumSq: Array[Double])
    extends Serializable

/**
 * Per-dimension first/second moments of a vector column in ONE pass —
 * the embedding-normalization prep (mean/variance per dimension for
 * whitening, feature scaling, drift monitoring) a training pipeline
 * runs over its whole embedding store.
 *
 * Why a custom `Aggregator` instead of `posexplode` + `groupBy(dim)`:
 * the explode materializes rows × dim element-rows through the whole
 * scan pipeline before partial aggregation collapses them — 64× the
 * row traffic at 100 TB for a result that is two fixed-size arrays.
 * This buffer is (1 + 2 × dim) doubles per (task × group); reduce is
 * a tight primitive-array loop over the row's vector, merge is an
 * element-wise add of two buffers, so the exchange carries one small
 * buffer per map task per group and nothing row-shaped.
 *
 * Rows whose vector is null or wrong-length are REJECTED loudly
 * (require) — a silent skip would corrupt the moments; length drift is
 * exactly the upstream bug this operator exists to catch.
 */
class VecStatsAgg(dim: Int)
    extends Aggregator[Seq[Float], VecStatsBuf, VecStatsBuf] with Serializable {
  require(dim >= 1, "dim must be >= 1")

  override def zero: VecStatsBuf =
    VecStatsBuf(0L, new Array[Double](dim), new Array[Double](dim))

  override def reduce(buf: VecStatsBuf, x: Seq[Float]): VecStatsBuf = {
    require(x != null && x.length == dim,
      s"vector length ${if (x == null) "null" else x.length} != dim $dim")
    val s = buf.sum
    val q = buf.sumSq
    var i = 0
    x match { // IndexedSeq fast path; Seq fallback stays O(dim)
      case ix: scala.collection.IndexedSeq[Float] =>
        while (i < dim) { val v = ix(i).toDouble; s(i) += v; q(i) += v * v; i += 1 }
      case other =>
        val it = other.iterator
        while (i < dim) { val v = it.next().toDouble; s(i) += v; q(i) += v * v; i += 1 }
    }
    VecStatsBuf(buf.n + 1, s, q)
  }

  override def merge(a: VecStatsBuf, b: VecStatsBuf): VecStatsBuf = {
    val s = a.sum
    val q = a.sumSq
    var i = 0
    while (i < dim) { s(i) += b.sum(i); q(i) += b.sumSq(i); i += 1 }
    VecStatsBuf(a.n + b.n, s, q)
  }

  override def finish(buf: VecStatsBuf): VecStatsBuf = buf

  override def bufferEncoder: Encoder[VecStatsBuf] =
    ExpressionEncoder[VecStatsBuf]()
  override def outputEncoder: Encoder[VecStatsBuf] =
    ExpressionEncoder[VecStatsBuf]()
}

object VecStatsAgg {
  /** The group's vector moments as one {n, sum, sumSq} struct. Pure
    * Column application — nothing registered in the session registry. */
  def vec_stats(vec: Column, dim: Int): Column =
    udaf(new VecStatsAgg(dim), ExpressionEncoder[Seq[Float]]())(vec)
}
