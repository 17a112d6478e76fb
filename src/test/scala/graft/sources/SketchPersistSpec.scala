package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The incremental-cardinality pattern behind q115 at 100 TB: each
 * ingest batch persists its per-source HLL sketches (a few KB of
 * BINARY per source) and later batches UNION against the stored
 * sketches — the historical corpus is never rescanned. Sound because
 * HLL registers are a max over hashed values: union(sk(A), sk(B)) has
 * bit-identical registers to sk(A ∪ B), so the incremental estimate
 * EXACTLY equals the full-recompute estimate (asserted, not
 * approximated).
 */
class SketchPersistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("persisted per-batch HLL sketches union to the full-corpus estimate exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val day2 = docs.filter(col("doc_id") % 2 === 1)

    val dir = java.nio.file.Files.createTempDirectory("graft_sk").toString
    day1.groupBy("source")
      .agg(expr("hll_sketch_agg(text, 14)").as("sk"))
      .write.mode("overwrite").parquet(s"$dir/sketches_day1")

    val stored = spark.read.parquet(s"$dir/sketches_day1")
    assert(stored.schema("sk").dataType ==
      org.apache.spark.sql.types.BinaryType, "sketches persist as BINARY")

    // incremental: stored day-1 sketches + fresh day-2 sketches
    val incr = stored
      .unionByName(day2.groupBy("source").agg(expr("hll_sketch_agg(text, 14)").as("sk")))
      .groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
    // full recompute over the whole corpus
    val full = docs.groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(text, 14))").as("est"))

    val i = incr.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val f = full.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(i.keySet == f.keySet)
    for ((k, v) <- f) assert(i(k) == v, s"estimate drift for $k: ${i(k)} vs $v")
    assert(f.nonEmpty)
  }
}
