package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Properties of the round-15 ingestion operators: token-window
  * chunking (q222) and the perceptual image dHash (q223). */
class ChunkDHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chunkTokens: full coverage, stride overlap, kept tail, exact reconstruction") {
    // lengths around every boundary: < window, == window, == window+1,
    // multiple strides, exact multiple, and a 1-token doc
    val docs = Seq(1, 5, 16, 17, 28, 29, 40, 100).zipWithIndex.map {
      case (n, i) => (i.toLong, (0 until n).map(k => s"w${k}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val out = TextOps.chunkTokens(df, "doc_id", "text", window = 16, stride = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1).map { case (id, rows) => id -> rows.sortBy(_._2) }
    for ((id, text) <- docs) {
      val toks = text.split(" ").toSeq
      val chunks = out(id)
      // expected chunk count: 1 + ceil((L - 16)/12) for L > 16
      val expectN = if (toks.length <= 16) 1
        else 1 + (toks.length - 16 + 11) / 12
      assert(chunks.length == expectN, s"doc $id: ${chunks.length} != $expectN")
      // indices contiguous from 0; every chunk is the exact slice
      for (((_, idx, n, fp), k) <- chunks.zipWithIndex) {
        assert(idx == k)
        val expect = toks.slice(k * 12, k * 12 + 16)
        assert(n == expect.length, s"doc $id chunk $k size")
        assert(fp == org.apache.commons.codec.digest.DigestUtils
          .md5Hex(expect.mkString(" ")), s"doc $id chunk $k fingerprint")
      }
      // coverage: the union of chunk ranges is exactly [0, L)
      val covered = chunks.indices
        .flatMap(k => k * 12 until math.min(k * 12 + 16, toks.length)).toSet
      assert(covered == toks.indices.toSet, s"doc $id coverage hole")
    }
    // degenerate: stride > window is refused (it would drop tokens)
    intercept[IllegalArgumentException] {
      TextOps.chunkTokens(df, "doc_id", "text", window = 8, stride = 9)
    }
  }

  test("dHash64: brightness invariance, locality, and banded-pair agreement") {
    def img(px: Array[Int]): Array[Byte] = px.map(_.toByte)
    val rnd = new scala.util.Random(7)
    val base = Array.fill(72)(rnd.nextInt(200) + 20) // headroom for +20
    val brighter = base.map(_ + 20)
    val oneOff = base.clone(); oneOff(40) += 13
    val df = Seq(
      (1L, img(base)), (2L, img(brighter)), (3L, img(oneOff))
    ).toDF("id", "pixels")
    val fps = Multimodal.dHash64(df, "pixels", "fp")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fp")).toMap
    // global brightness shift: every gradient sign unchanged
    assert(fps(1L) == fps(2L), "dHash must be brightness-invariant")
    // one perturbed pixel flips at most its two adjacent comparisons
    val ham = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(ham <= 2, s"single-pixel edit flipped $ham > 2 bits")
    // wrong-size / null payloads hash to null, not an error
    val bad = Multimodal.dHash64(
      Seq((9L, Array.fill(10)(1.toByte))).toDF("id", "pixels"), "pixels", "fp")
      .collect()
    assert(bad.head.isNullAt(bad.head.fieldIndex("fp")))
    // hammingPairs64 finds exactly the close pairs (1,2,3 mutually
    // within hamming 2; a random fourth image is not)
    val far = Array.fill(72)(rnd.nextInt(256))
    val all = Seq((1L, img(base)), (2L, img(brighter)), (3L, img(oneOff)),
      (4L, img(far))).toDF("id", "pixels")
    val pairs = Dedup.hammingPairs64(
        Multimodal.dHash64(all, "pixels", "fp"), "id", "fp", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"pairs: $pairs")
  }
}
