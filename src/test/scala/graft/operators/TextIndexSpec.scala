package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted text-dedup index must be a pure artifact: pairs
  * computed against a REOPENED index are bit-identical to the
  * recompute-everything path, and appending a batch folds it into the
  * standing corpus for subsequent queries. */
class TextIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("textindex").toFile
    d.deleteOnExit()
    d.toString
  }

  test("reopened index pairs == crossCorpusPairs recompute, bit-for-bit") {
    val path = tmpDir()
    Dedup.saveTextIndex(docs, "doc_id", "text", n = 3, bands = 16,
      rowsPerBand = 4, path = path)
    // fresh batch: 10 exact twins (ids + 5000) and 10 reversed (novel)
    val twins = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val novel = docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
      .select((col("doc_id") + 6000).as("doc_id"),
        concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    val fresh = twins.unionByName(novel)
    val ix = Dedup.loadTextIndex(spark, path)
    assert(ix.n == 3 && ix.bands == 16 && ix.rowsPerBand == 4)
    val viaIndex = Dedup.incrementalPairsAgainst(ix, fresh, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val recomputed = Dedup.crossCorpusPairs(docs, fresh, "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(viaIndex == recomputed)
    // every twin found against its own source with jaccard 1.0
    for (i <- 0L until 10L)
      assert(viaIndex.contains((i, i + 5000, 1.0)), s"twin $i missing: $viaIndex")
  }

  test("append folds a batch into the standing index for later queries") {
    val path = tmpDir()
    Dedup.saveTextIndex(docs, "doc_id", "text", 3, 16, 4, path)
    // append doc 0's twin as id 9000 into the INDEX
    val batch = docs.filter(col("doc_id") === 0)
      .select(lit(9000L).as("doc_id"), col("text"))
    Dedup.saveTextIndex(batch, "doc_id", "text", 3, 16, 4, path, append = true)
    val ix = Dedup.loadTextIndex(spark, path)
    // a later query that duplicates doc 0 must now hit BOTH copies
    val q = docs.filter(col("doc_id") === 0)
      .select(lit(9500L).as("doc_id"), col("text"))
    val hits = Dedup.incrementalPairsAgainst(ix, q, "doc_id", "text", 0.99)
      .collect().map(r => r.getLong(0)).toSet
    assert(hits == Set(0L, 9000L), s"appended copy not indexed: $hits")
  }

  test("a partial index path fails loudly") {
    val path = tmpDir()
    intercept[Exception](Dedup.loadTextIndex(spark, path))
  }

  test("append against a not-yet-existing index gives a clear error, not a raw path failure") {
    val path = tmpDir() + "/nope"
    val err = intercept[IllegalArgumentException](
      Dedup.saveTextIndex(docs.limit(5), "doc_id", "text", n = 3, bands = 16,
        rowsPerBand = 4, path = path, append = true))
    assert(err.getMessage.contains("no text index"), err.getMessage)
  }
}
