package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PageRank recurrences against a hand-rolled f64 iteration
  * on a tiny graph with a dangling node: the default variant leaks the
  * dangling node's damped mass, the `dangling = true` variant
  * redistributes it uniformly and conserves total mass exactly. */
class RankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // a -> b, b -> a, a -> c; c has no out-edges (dangling)
  private def edges = {
    val s = spark
    import s.implicits._
    Seq(("a", "b", 1.0), ("b", "a", 1.0), ("a", "c", 1.0))
      .toDF("src", "dst", "weight")
  }

  /** Reference iteration: p(a->b) = p(a->c) = 0.5, p(b->a) = 1. */
  private def ref(iters: Int, dangling: Boolean): Map[String, Double] = {
    val d = 0.85; val n = 3.0
    var (ra, rb, rc) = (1.0 / n, 1.0 / n, 1.0 / n)
    for (_ <- 1 to iters) {
      val dm = if (dangling) rc else 0.0
      val (ma, mb, mc) = (rb * 1.0, ra * 0.5, ra * 0.5)
      ra = (1.0 - d) / n + d * (ma + dm / n)
      rb = (1.0 - d) / n + d * (mb + dm / n)
      rc = (1.0 - d) / n + d * (mc + dm / n)
    }
    Map("a" -> ra, "b" -> rb, "c" -> rc)
  }

  private def run(iters: Int, dangling: Boolean): Map[String, Double] =
    Rank.weightedPageRank(edges, d = 0.85, iters = iters, dangling = dangling)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("default variant matches the leaky reference; mass drains") {
    val got = run(iters = 7, dangling = false)
    val want = ref(7, dangling = false)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    assert(got.values.sum < 1.0 - 0.05, s"mass should leak, got ${got.values.sum}")
  }

  test("dangling variant matches the redistributing reference; mass conserved") {
    // 7 iterations crosses the every-4 localCheckpoint boundary
    val got = run(iters = 7, dangling = true)
    val want = ref(7, dangling = true)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    assert(math.abs(got.values.sum - 1.0) < 1e-12,
      s"mass should be conserved, got ${got.values.sum}")
  }
}
