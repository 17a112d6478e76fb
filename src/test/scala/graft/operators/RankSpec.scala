package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank semantics pinned on closed-form graphs: the symmetric
  * 2-cycle's fixed point, the pinned dangling-leak variant, weight
  * normalization, and layout determinism. */
class RankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ranks(edges: Seq[(String, String, Double)], d: Double,
      iters: Int): Map[String, Double] = {
    import spark.implicits._
    Rank.weightedPageRank(edges.toDF("src", "dst", "weight"), d, iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric 2-cycle sits at its 0.5/0.5 fixed point from iteration 1") {
    val r = ranks(Seq(("a", "b", 1.0), ("b", "a", 1.0)), 0.85, 10)
    assert(math.abs(r("a") - 0.5) < 1e-12 && math.abs(r("b") - 0.5) < 1e-12)
  }

  test("dangling node leaks damped mass (the pinned no-redistribution variant)") {
    // a -> b, b has no out-edges: total mass shrinks every iteration
    val r = ranks(Seq(("a", "b", 1.0)), 0.85, 10)
    assert(r("a") == (1.0 - 0.85) / 2, s"a=${r("a")}")
    assert(r.values.sum < 1.0 - 1e-6, s"no leak observed: ${r.values.sum}")
    assert(r("b") > r("a"), "the pointed-at node must outrank the source")
  }

  test("edge weights normalize per source: a 9:1 split propagates 9:1") {
    val r = ranks(Seq(("a", "b", 9.0), ("a", "c", 1.0),
      ("b", "a", 1.0), ("c", "a", 1.0)), 0.85, 20)
    val base = (1.0 - 0.85) / 3
    assert(math.abs((r("b") - base) / (r("c") - base) - 9.0) < 1e-9,
      s"split not 9:1: ${r("b")} vs ${r("c")}")
  }

  test("sf0.001 bigram graph: layout-deterministic, mass accounted, common words rank high") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e = Rank.bigramEdges(docs, "text")
    val r1 = Rank.weightedPageRank(e, 0.85, 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val r2 = Rank.weightedPageRank(
        Rank.bigramEdges(docs.repartition(7), "text"), 0.85, 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1.keySet == r2.keySet)
    for ((k, v) <- r1) assert(math.abs(v - r2(k)) < 1e-12, s"$k: $v vs ${r2(k)}")
    // every node has out-edges in this graph -> mass conserved to ulps
    assert(math.abs(r1.values.sum - 1.0) < 1e-9, s"mass ${r1.values.sum}")
  }
}
