package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted 64-bit-fingerprint dedup index (q231) must be a pure
  * artifact — the TextIndexSpec contract, perceptual-hash form: pairs
  * against a REOPENED index are bit-identical to the in-query banded
  * join, append folds a batch into the standing corpus, and parameter
  * mismatches fail loudly instead of silently mis-banding. */
class HashIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("hashindex").toFile
    d.deleteOnExit()
    d.toString
  }

  /** md5-avalanched fingerprints (the q223 recipe, hash-level): random
    * 64-bit values, so the only hamming<=3 pairs are the planted
    * low-bit perturbations. */
  private def fp(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hx:$id".getBytes("UTF-8"))
    md.take(8).zipWithIndex.map { case (b, i) => (b.toLong & 0xff) << (8 * i) }.sum
  }

  test("reopened index pairs == in-query hammingPairs64, bit-for-bit; planted pairs recovered") {
    val path = tmpDir()
    val corpus = (0L until 300L).map(i => (i, fp(i))).toDF("img_id", "f")
    Dedup.saveHashIndex(corpus, "img_id", "f", maxHamming = 3, path = path)
    val ix = Dedup.loadHashIndex(spark, path)
    assert(ix.maxHamming == 3)
    // fresh batch: 20 planted near-dups (2 bits flipped) + 20 novel
    val fresh = ((0L until 20L).map(i => (i + 10000L, fp(i) ^ 5L)) ++
      (500L until 520L).map(i => (i + 10000L, fp(i)))).toDF("img_id", "f")
    val viaIndex = Dedup.incrementalHammingAgainst(ix, fresh, "img_id", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    // the recompute-everything path: one pooled corpus, cross pairs only
    val pooled = corpus.unionByName(fresh)
    val recomputed = Dedup.hammingPairs64(pooled, "img_id", "f", maxHamming = 3)
      .filter(col("a") < 10000L && col("b") >= 10000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(viaIndex == recomputed,
      s"index probe diverged: $viaIndex vs $recomputed")
    assert(viaIndex.size == 20, s"expected exactly the planted pairs: $viaIndex")
    for (i <- 0L until 20L)
      assert(viaIndex.contains((i, i + 10000L, 2)), s"planted pair $i missing")
  }

  test("append folds a batch in; parameter mismatch and missing index fail loudly") {
    val path = tmpDir()
    val corpus = (0L until 100L).map(i => (i, fp(i))).toDF("img_id", "f")
    Dedup.saveHashIndex(corpus, "img_id", "f", 3, path)
    Dedup.saveHashIndex(Seq((9000L, fp(7L))).toDF("img_id", "f"),
      "img_id", "f", 3, path, append = true)
    val ix = Dedup.loadHashIndex(spark, path)
    val q = Seq((9500L, fp(7L) ^ 1L)).toDF("img_id", "f")
    val hits = Dedup.incrementalHammingAgainst(ix, q, "img_id", "f")
      .collect().map(r => r.getLong(0)).toSet
    assert(hits == Set(7L, 9000L), s"appended copy not indexed: $hits")
    val mismatch = intercept[IllegalArgumentException] {
      Dedup.saveHashIndex(corpus, "img_id", "f", 7, path, append = true)
    }
    assert(mismatch.getMessage.contains("mismatch"))
    val missing = intercept[IllegalArgumentException] {
      Dedup.saveHashIndex(corpus, "img_id", "f", 3, tmpDir() + "/nope",
        append = true)
    }
    assert(missing.getMessage.contains("no hash index"))
  }

  test("append crash between the two artifact writes leaves the index fully old") {
    val path = tmpDir()
    val corpus = (0L until 100L).map(i => (i, fp(i))).toDF("img_id", "f")
    Dedup.saveHashIndex(corpus, "img_id", "f", 3, path)
    val before = Dedup.loadHashIndex(spark, path)
    val probe = Seq((9500L, fp(7L) ^ 1L), (9501L, fp(7000L) ^ 1L))
      .toDF("img_id", "f")
    val oldHits = Dedup.incrementalHammingAgainst(before, probe, "img_id", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // simulate the crash: the append's FIRST write (bands) lands, the
    // second (fps) never does — saveHashIndex's append order
    val batch = Seq((9000L, fp(7000L))).toDF("img_id", "f")
      .select(col("img_id").as("id"), col("f").as("fp"))
    Dedup.writeHashIndexBands(batch, 3, path, "append")
    val crashed = Dedup.loadHashIndex(spark, path)
    val crashedHits = Dedup.incrementalHammingAgainst(crashed, probe, "img_id", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(crashedHits == oldHits,
      s"dangling band rows changed probe results: $crashedHits vs $oldHits")
    // the retried append completes the batch; probes now see it
    Dedup.writeHashIndexFps(batch, path, "append")
    val after = Dedup.loadHashIndex(spark, path)
    val newHits = Dedup.incrementalHammingAgainst(after, probe, "img_id", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(newHits.contains((9000L, 9501L)), s"completed append invisible: $newHits")
  }

  test("overwrite crash mid-rewrite is loud (invalidated meta), never a silent mix") {
    val path = tmpDir()
    val corpus = (0L until 50L).map(i => (i, fp(i))).toDF("img_id", "f")
    Dedup.saveHashIndex(corpus, "img_id", "f", 3, path)
    // simulate the crash: overwrite invalidates meta FIRST, then dies
    // before the data writes — exactly saveHashIndex's overwrite order
    spark.emptyDataset[Int].toDF("max_hamming")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val broken = intercept[IllegalArgumentException] {
      Dedup.loadHashIndex(spark, path)
    }
    assert(broken.getMessage.contains("bad hash-index meta"))
    // a completed rewrite restores a loadable, correct index
    Dedup.saveHashIndex(corpus, "img_id", "f", 3, path)
    assert(Dedup.loadHashIndex(spark, path).maxHamming == 3)
  }
}
