package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Behavioral pin for [[Similarity.marginMine]] (q225): margin mining
  * recovers planted translations and suppresses hub vectors — the two
  * properties that made the ratio margin the LASER/CCMatrix criterion
  * over a plain cosine threshold. */
class MarginMineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("planted mates recovered for every source; hubs never mined as mates") {
    val dim = 32 // > 20 + 2: source directions never wrap into each other
    def vec(parts: (Int, Double)*): Array[Float] = {
      val v = new Array[Float](dim)
      for ((i, x) <- parts) v(i % dim) = (v(i % dim) + x).toFloat
      v
    }
    // 20 sources in distinct directions; each has ONE slightly-rotated
    // planted mate on the other side, plus 5 HUB vectors (near the
    // all-ones direction — cosine-close to EVERYTHING, the hubness
    // pathology margin normalization exists to suppress)
    val xs = (0 until 20).map(i =>
      (i.toLong * 2, vec((i, 1.0), (i + 1, 0.1))))
    val mates = (0 until 20).map(i =>
      (i.toLong * 2 + 1, vec((i, 1.0), (i + 1, 0.1), (i + 2, 0.05))))
    val hubs = (0 until 5).map(h =>
      (1001L + h * 2, Array.tabulate(dim)(j => (1.0 + 0.01 * ((h + j) % 3)).toFloat)))
    val xdf = xs.toDF("vec_id", "embedding")
    val ydf = (mates ++ hubs).toDF("vec_id", "embedding")
    val mined = Similarity.marginMine(xdf, ydf, "vec_id", "embedding",
        k = 3, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((xid, _) <- xs) {
      val (mate, margin) = mined.getOrElse(xid,
        fail(s"source $xid mined nothing"))
      assert(mate == xid + 1, s"source $xid mined $mate, not its planted mate")
      assert(margin >= 1.0, s"source $xid margin $margin")
    }
    // hub suppression, directly: a source WITHOUT a planted mate must
    // not mine a hub above the margin threshold — hubs are average
    // neighbors by construction, so their ratio margin sits ~1, and
    // the miner yields NOTHING rather than a false pair (the failure
    // mode a plain cosine threshold cannot avoid: the orphan's best
    // raw cosine IS a hub)
    val orphan = Seq((9000L, vec((25, 1.0), (26, 0.1)))).toDF("vec_id", "embedding")
    val orphanTop = Similarity.bruteForceTopK(ydf, orphan,
        "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(2))
    assert(orphanTop.headOption.exists(_ >= 1000L),
      "the orphan's raw-cosine best must be a hub for this check to bite")
    val orphanMined = Similarity.marginMine(orphan, ydf, "vec_id", "embedding",
        k = 3, threshold = 1.05)
      .collect()
    assert(orphanMined.isEmpty,
      s"the orphan mined a false pair: ${orphanMined.mkString(",")}")
  }

  test("marginMineAnn recovers every planted mate with a bit-equal margin") {
    val dim = 32
    def vec(parts: (Int, Double)*): Array[Float] = {
      val v = new Array[Float](dim)
      for ((i, x) <- parts) v(i % dim) = (v(i % dim) + x).toFloat
      v
    }
    val xs = (0 until 20).map(i =>
      (i.toLong * 2, vec((i, 1.0), (i + 1, 0.1))))
    val mates = (0 until 20).map(i =>
      (i.toLong * 2 + 1, vec((i, 1.0), (i + 1, 0.1), (i + 2, 0.05))))
    val hubs = (0 until 5).map(h =>
      (1001L + h * 2, Array.tabulate(dim)(j => (1.0 + 0.01 * ((h + j) % 3)).toFloat)))
    val xdf = xs.toDF("vec_id", "embedding")
    val ydf = (mates ++ hubs).toDF("vec_id", "embedding")
    val brute = Similarity.marginMine(xdf, ydf, "vec_id", "embedding",
        k = 3, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // full-probe ANN (nprobe = nlist, generous shortlist) must agree
    // with brute PAIR-FOR-PAIR with BIT-EQUAL margins: every true
    // neighbor is in some probed cell, the exact-cosine rerank
    // recovers the true top-k, and marginFromTopK is shared code
    val ann = Similarity.marginMineAnn(xdf, ydf, "vec_id", "embedding",
        k = 3, threshold = 1.0,
        dim = dim, nlist = 4, m = 4, ksub = 8, nprobe = 4, shortlist = 25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ann == brute,
      s"full-probe ANN mining diverged from brute: ann=$ann brute=$brute")
    for ((xid, _) <- xs)
      assert(ann(xid)._1 == xid + 1, s"source $xid mined ${ann(xid)._1}")
  }
}
