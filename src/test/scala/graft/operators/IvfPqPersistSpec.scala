package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVFADC index persistence: the index is an artifact at 100 TB —
  * train once, persist, reopen, absorb new shards with the FROZEN
  * codebooks. Everything here must be BIT-identical, not approximately
  * equal: doubles round-trip parquet exactly, so a reopened index has
  * no excuse to rank differently. */
class IvfPqPersistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  test("save/load round-trips the index bit-exactly; reopened index + codes query identically") {
    val ix = Similarity.ivfPqTrain(emb, "embedding", dim = 64, nlist = 8, m = 8, ksub = 16)
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-persist").toString
    Similarity.saveIndex(spark, ix, s"$tmp/index")
    val ix2 = Similarity.loadIndex(spark, s"$tmp/index")
    assert(ix2.coarse.map(_.toSeq).toSeq == ix.coarse.map(_.toSeq).toSeq)
    assert(ix2.books.m == ix.books.m && ix2.books.dsub == ix.books.dsub)
    assert(ix2.books.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      ix.books.centroids.map(_.map(_.toSeq).toSeq).toSeq)

    // codes table persisted + reopened; queries through the REOPENED
    // index over the REOPENED codes must equal the fresh path bit-wise
    val codes = Similarity.ivfPqEncode(emb, "vec_id", "embedding", ix)
    codes.write.mode("overwrite").parquet(s"$tmp/codes")
    val reopened = spark.read.parquet(s"$tmp/codes")
    val qs = emb.filter(col("vec_id") < 10)
    def run(cs: org.apache.spark.sql.DataFrame, i: Similarity.IvfPqIndex) =
      Similarity.ivfPqTopKReranked(emb, cs, qs, "vec_id", "embedding", i,
        k = 5, shortlist = 50, nprobe = 6)
        .collect().map(_.toSeq).toSet
    val fresh = run(codes, ix)
    assert(fresh.nonEmpty)
    assert(run(reopened, ix2) == fresh)
  }

  test("frozen-codebook incremental encode of a new shard == full re-encode") {
    val ix = Similarity.ivfPqTrain(emb, "embedding", dim = 64, nlist = 8, m = 8, ksub = 16)
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-incr").toString
    Similarity.saveIndex(spark, ix, s"$tmp/index")
    val ix2 = Similarity.loadIndex(spark, s"$tmp/index")

    // standing corpus A persisted; new shard B arrives later and is
    // encoded ONLY with the reopened frozen codebooks — no retraining,
    // no touch of A's rows
    val a = emb.filter(col("vec_id") % 5 =!= 0)
    val b = emb.filter(col("vec_id") % 5 === 0)
    Similarity.ivfPqEncode(a, "vec_id", "embedding", ix)
      .write.mode("overwrite").parquet(s"$tmp/codes_a")
    val codesA = spark.read.parquet(s"$tmp/codes_a")
    val codesB = Similarity.ivfPqEncode(b, "vec_id", "embedding", ix2)
    val union = codesA.unionByName(codesB)
    val full = Similarity.ivfPqEncode(emb, "vec_id", "embedding", ix)
    assert(union.count() == full.count())
    assert(union.exceptAll(full).count() == 0)
    assert(full.exceptAll(union).count() == 0)
  }

  test("a mangled index path fails loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-bad").toString
    val ix = Similarity.ivfPqTrain(emb, "embedding", dim = 64, nlist = 4, m = 8, ksub = 8)
    Similarity.saveIndex(spark, ix, s"$tmp/index")
    // drop one codebook row: the completeness check must reject
    val books = spark.read.parquet(s"$tmp/index/books")
    books.filter(!(col("s") === 0 && col("c") === 0))
      .write.mode("overwrite").parquet(s"$tmp/index2/books")
    spark.read.parquet(s"$tmp/index/coarse")
      .write.mode("overwrite").parquet(s"$tmp/index2/coarse")
    val e = intercept[IllegalArgumentException] {
      Similarity.loadIndex(spark, s"$tmp/index2")
    }
    assert(e.getMessage.contains("incomplete"), e.getMessage)
  }
}
