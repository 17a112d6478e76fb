package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * MinHash signature as a typed `Aggregator` (UDAF) over a stream of
 * pre-hashed features — the MERGEABLE form of [[MinHashSig]]: the
 * buffer is the per-hash minima vector and `merge` is elementwise min,
 * so partial signatures combine associatively across partitions
 * (map-side combine does most of the work; only numHashes longs per
 * group cross the shuffle). This is the shape that matters when the
 * feature set for a key is never materialized in one place — shingles
 * arriving pre-exploded from an inverted index, or accumulating across
 * micro-batches — and it is BIT-IDENTICAL to the single-pass
 * [[MinHashSig]] expression on the collected array (EquivalenceSpec).
 */
class MinHashAgg(numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  private val seeds = MinHashSig.seedsFor(numHashes)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      val v = MinHashSig.splitmix64(h ^ seeds(j))
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Register as `minhash_agg_<numHashes>` and return the aggregate
    * column over a long feature column. */
  def minhash_agg(spark: SparkSession, c: Column, numHashes: Int): Column = {
    val name = s"minhash_agg_$numHashes"
    spark.udf.register(name, udaf(new MinHashAgg(numHashes), Encoders.scalaLong))
    org.apache.spark.sql.functions.call_function(name, c)
  }
}
