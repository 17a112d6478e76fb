package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Misra-Gries heavy hitters as a typed `Aggregator` (UDAF): at most
 * `k-1` candidate counters survive, and every item with true frequency
 * > n/k is GUARANTEED to be among them (counts are underestimates by
 * at most n/k). `merge` is the standard MG summary merge — sum
 * counters, then subtract the k-th largest count and drop non-positive
 * — so partial summaries combine associatively across partitions:
 * constant state per group crosses the shuffle, never the token
 * stream. The companion of [[MinHashAgg]] in the mergeable-sketch
 * family; the exact groupBy top-k (q38) is the correctness baseline.
 */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] with Serializable {
  require(k >= 2, "k must be >= 2")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k - 1 => m.updated(x, 1L)
      case None => m.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k - 1) summed
    else {
      // subtract the k-th largest count from everything, drop <= 0 —
      // preserves the MG underestimate-by-at-most-n/k invariant
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      summed.flatMap { case (t, c) => if (c > kth) Some(t -> (c - kth)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHittersAgg {
  /** Register as `heavy_hitters_<k>` and return the aggregate column
    * (a map token -> underestimated count) over a string column. */
  def heavy_hitters(spark: SparkSession, c: Column, k: Int): Column = {
    val name = s"heavy_hitters_$k"
    spark.udf.register(name, udaf(new HeavyHittersAgg(k), Encoders.STRING))
    org.apache.spark.sql.functions.call_function(name, c)
  }
}
