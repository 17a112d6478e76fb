package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the cross-expression invariants the operator docs rely on:
 * refactors that break bit-compatibility fail here, not in a silent
 * oracle divergence three stages downstream.
 */
class EquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("shingle_hashes == rolling_hash64 applied to shingles (bit-identical)") {
    val viaStrings = docs.select(col("doc_id"),
      transform(
        graft.functions.Shingles.shingles(spark, col("text"), 3),
        s => { RollingHash64.register(spark); RollingHash64.rolling_hash64(s) })
        .as("h"))
    val native = docs.select(col("doc_id"),
      ShingleHashes.shingle_hashes(spark, col("text"), 3).as("h"))
    val a = viaStrings.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("vec_unit == composed when/aggregate/transform normalization (bit-identical)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // edge cases the fixture lacks: zero vector, NaN element, null
    // element, empty array, null array
    val edge = Seq(
      (100000L, Seq[java.lang.Double](0.0, 0.0, 0.0)),
      (100001L, Seq[java.lang.Double](1.0, Double.NaN)),
      (100002L, Seq[java.lang.Double](3.0, null, 4.0)),
      (100003L, Seq[java.lang.Double]()),
      (100004L, null)
    ).toDF("vec_id", "e")
    val df = emb.unionByName(edge)
    val e = col("e")
    val nrm = sqrt(aggregate(e, lit(0.0), (a, v) => a + v * v))
    val composed = df.select(col("vec_id"),
      when(nrm > 0, transform(e, v => v / nrm)).otherwise(e).as("u"))
    val native = df.select(col("vec_id"),
      VecUnit.vec_unit(spark, e).as("u"))
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      Option(r.getSeq[java.lang.Double](1))
        .map(_.map(d => if (d == null) null
          else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(d))))
    assert(composed.collect().map(key).toMap == native.collect().map(key).toMap)
  }

  test("minhash_sig and minhash_buckets share the same minima chain") {
    // fold minhash_sig's raw minima into band keys in scala and compare
    // with the native banded expression
    val bands = 8
    val rows = 4
    val withSets = docs.select(col("doc_id"),
      ShingleHashes.shingle_hashes(spark, col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = withSets.select(col("doc_id"),
      MinHashSig.minhash_sig(spark, col("sh"), bands * rows).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val buckets = withSets.select(col("doc_id"),
      MinHashBuckets.minhash_buckets(spark, col("sh"), bands, rows).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, sig) <- sigs) {
      val expected = (0 until bands).map { b =>
        (0 until rows).foldLeft(0L)((k, r) =>
          MinHashSig.splitmix64(k ^ sig(b * rows + r)))
      }
      assert(buckets(id) == expected, s"bucket mismatch for doc $id")
    }
  }

  test("winnow_fps gram hash == SQL conv(substring(md5, 1, 15), 16, 10)") {
    // k=1, w=1: fingerprints are exactly the distinct per-token hashes,
    // so the native digest math ((first 8 md5 bytes) >>> 4) must equal
    // the composed md5/conv column expression token by token
    val native = docs.select(col("doc_id"),
      WinnowFps.winnow_fps(spark, col("text"), 1, 1).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = docs.select(col("doc_id"),
      array_distinct(transform(
        call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == composed.keySet)
    // native emits nothing for empty docs; composed emits an empty array
    native.foreach { case (id, fps) => assert(fps == composed(id), s"doc $id") }
  }

  test("MinHashAgg over exploded shingle hashes == minhash_sig on the array") {
    val numHashes = 32
    val withSets = docs.select(col("doc_id"),
      ShingleHashes.shingle_hashes(spark, col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val viaExpr = withSets.select(col("doc_id"),
      MinHashSig.minhash_sig(spark, col("sh"), numHashes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = withSets
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy("doc_id")
      .agg(MinHashAgg.minhash_agg(spark, col("h"), numHashes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg == viaExpr)
  }

  test("HeavyHittersAgg: MG guarantee — freq > n/k items always survive the merge") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // skewed stream: 3 heavy tokens (~20% each) + uniform noise tail
    val n = 20000
    val stream = (0 until n).map { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 => "heavy_a"
        case 2 | 3 => "heavy_b"
        case 4 | 5 => "heavy_c"
        case _ => s"noise_${rnd.nextInt(2000)}"
      }
    }
    val k = 16
    val df = stream.toDF("token").repartition(13) // force real merges
    val mg = df.agg(HeavyHittersAgg.heavy_hitters(spark, col("token"), k))
      .collect()(0).getMap[String, Long](0)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.filter(_._2 > n / k).keys.foreach { t =>
      assert(mg.contains(t), s"guaranteed heavy hitter $t missing from $mg")
      // MG counts are underestimates, never overestimates
      assert(mg(t) <= exact(t), s"$t overestimated: ${mg(t)} > ${exact(t)}")
    }
    assert(mg.size <= k - 1, s"MG summary exceeded k-1 counters: ${mg.size}")
  }

  test("lsh_band_keys matches signBits-derived band keys for <=64 planes") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val numPlanes = 16
    val bands = 8
    val width = numPlanes / bands
    val mask = (1L << width) - 1
    val viaSignBits = emb.select(col("vec_id"),
      graft.operators.Similarity.signBits(spark, col("e"), 64, numPlanes).as("sig"))
      .collect().map { r =>
        val sig = r.getLong(1)
        r.getLong(0) -> (0 until bands).map(b => (sig >>> (b * width)) & mask)
      }.toMap
    val viaNative = emb.select(col("vec_id"),
      slice(LshBandKeys.lsh_band_keys(spark, col("e"), numPlanes, bands), 1, bands).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    assert(viaSignBits.keySet == viaNative.keySet)
    for ((id, keys) <- viaSignBits) assert(viaNative(id) == keys, s"vec $id")
  }
}
