package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Pins [[Pca]]'s numerics: the Gram pass must be partition-invariant
 * (merge = element-wise add), the power iteration must find the
 * analytic dominant eigenvector on a fixture with a known covariance,
 * and the centered projection must average to zero. Length drift is a
 * loud failure, never a skip.
 */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 2-d fixture stretched along (1, 1)/sqrt(2): x = t·(1,1) + s·(1,-1)
  // with Var(t) >> Var(s). 210 points = two full CRT cycles of
  // (i mod 21, i mod 5), so Cov(t, s) is EXACTLY zero and the top
  // component is analytically (1/sqrt(2), 1/sqrt(2)) with eigenvalue
  // 2·Var(t); all values are dyadic (integers + quarters), so the f32
  // storage is exact and the uniform init is exactly orthogonal to
  // the second eigenvector — convergence is immediate.
  private val N = 210
  private def tOf(i: Int) = (i % 21).toDouble - 10.0
  private def sOf(i: Int) = ((i * 7) % 5).toDouble / 4.0 - 0.5
  private def fixture() = {
    import spark.implicits._
    (0 until N).map { i =>
      val (t, s) = (tOf(i), sOf(i))
      (i.toLong, Seq((t + s).toFloat, (t - s).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("power iteration recovers the analytic dominant eigenvector") {
    val m = Pca.fitTop(fixture(), "embedding", dim = 2, iters = 16)
    val inv = 1.0 / math.sqrt(2.0)
    // sign is pinned by the all-positive init (positive overlap with v*)
    assert(math.abs(m.component(0) - inv) < 1e-9, m.component.toSeq)
    assert(math.abs(m.component(1) - inv) < 1e-9, m.component.toSeq)
    // eigenvalue = 2·Var(t) for the exact fixture values
    val ts = (0 until N).map(tOf)
    val mu = ts.sum / ts.length
    val varT = ts.map(t => (t - mu) * (t - mu)).sum / ts.length
    assert(math.abs(m.eigenvalue - 2.0 * varT) < 1e-9,
      s"lambda ${m.eigenvalue} vs ${2.0 * varT}")
    assert(m.explainedVarianceRatio > 0.99)
  }

  test("gram pass is partition-invariant and projections center at zero") {
    val df = fixture()
    val m1 = Pca.fitTop(df.coalesce(1), "embedding", dim = 2, iters = 8)
    val m32 = Pca.fitTop(df.repartition(32), "embedding", dim = 2, iters = 8)
    (0 until 2).foreach { i =>
      assert(math.abs(m1.component(i) - m32.component(i)) < 1e-9)
    }
    assert(math.abs(m1.eigenvalue - m32.eigenvalue) < 1e-9)
    val mean = df.select(avg(Pca.projectTop(m1, col("embedding")))).head().getDouble(0)
    assert(math.abs(mean) < 1e-9, s"centered projection mean $mean")
  }

  test("residualNorm: analytic sqrt(2)·|s| on the fixture (top component fully removed)") {
    import org.apache.spark.sql.functions.{col, sqrt => _}
    val df = fixture()
    val m = Pca.fitTop(df, "embedding", dim = 2, iters = 16)
    // x = t·(1,1) + s·(1,−1), v = (1,1)/√2, mean_t = 0 exactly →
    // x − p·v = (s, −s): residual norm is √2·|s| analytically
    val got = df.select(col("vec_id"), col("embedding"),
        Pca.projectTop(m, col("embedding")).as("p"))
      .select(col("vec_id"),
        Pca.residualNorm(m, col("embedding"), col("p")).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0 until N).foreach { i =>
      val exp = math.sqrt(2.0) * math.abs(sOf(i))
      assert(math.abs(got(i.toLong) - exp) < 1e-9, s"row $i: ${got(i.toLong)} vs $exp")
    }
  }

  test("pc1ShardCoherence: 16 shards + global row, counts conserve, partition-invariant, locality lifts coherence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // half-integer offset: the zero vector (NaN cosine) needs t = −offset
    // with integer t, so it cannot occur — while the angular spread
    // stays wide enough that per-shard coherence ~1 vs global ~0
    val df = (0 until 420).map { i =>
      val t = (i % 21).toDouble - 10.0
      val s = ((i * 7) % 5).toDouble / 4.0 - 0.5
      (i.toLong, Seq((0.5 + t + s).toFloat, (0.5 + t - s).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Pca.fitTop(df, "embedding", dim = 2, iters = 16)
    def run(d: org.apache.spark.sql.DataFrame) =
      Pca.pc1ShardCoherence(d, "vec_id", "embedding", m, shards = 16)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val out = run(df)
    val (global, shards) = out.partition(_._1 == -1)
    assert(global.length == 1 && global.head._2 == 420L)
    assert(shards.map(_._2).sum == 420L && shards.nonEmpty)
    assert(run(df.repartition(32)).toSeq == out.toSeq, "not partition-invariant")
    // weighted shard coherence must beat the global baseline on a
    // cloud that pc1 genuinely orders
    val weighted = shards.map(s => s._2 * s._3).sum / 420.0
    assert(weighted > global.head._3 + 1e-4,
      s"locality bought nothing: $weighted vs ${global.head._3}")
  }

  test("length drift fails loudly") {
    import spark.implicits._
    val bad = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).toDF("embedding")
    val e = intercept[Exception] {
      Pca.fitTop(bad, "embedding", dim = 2, iters = 2)
    }
    assert(e.getMessage != null)
  }
}
