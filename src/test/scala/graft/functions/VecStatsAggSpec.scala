package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecStatsAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("moments equal the naive per-element computation (random data, random partitioning)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 7
    val data = Seq.tabulate(500)(i =>
      (i.toLong % 3, Seq.fill(dim)(rnd.nextFloat() * 4f - 2f)))
    val df = data.toDF("g", "vec").repartition(13)
    val got = df.groupBy("g").agg(VecStatsAgg.vec_stats(col("vec"), dim).as("st"))
      .select(col("g"), col("st.n"), col("st.sum"), col("st.sumSq"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3))).toMap

    for (g <- 0L to 2L) {
      val vecs = data.filter(_._1 == g).map(_._2)
      val (n, s, q) = got(g)
      assert(n == vecs.length)
      for (d <- 0 until dim) {
        val xs = vecs.map(_(d).toDouble)
        // element-wise double accumulation: same values, order-free to
        // ~1e-12 relative — assert tight
        assert(math.abs(s(d) - xs.sum) < 1e-9, s"sum g=$g d=$d")
        assert(math.abs(q(d) - xs.map(x => x * x).sum) < 1e-9, s"sumSq g=$g d=$d")
      }
    }
  }

  test("wrong-length vector fails loudly, not silently") {
    import spark.implicits._
    val df = Seq(Seq(1f, 2f, 3f), Seq(1f, 2f)).toDF("vec")
    val e = intercept[Exception] {
      df.agg(VecStatsAgg.vec_stats(col("vec"), 3)).collect()
    }
    assert(e.getMessage != null)
  }

  test("empty group yields n=0 zero buffers") {
    import spark.implicits._
    val df = Seq.empty[Seq[Float]].toDF("vec")
    val r = df.agg(VecStatsAgg.vec_stats(col("vec"), 4).as("st"))
      .select("st.n", "st.sum").collect().head
    assert(r.getLong(0) == 0L && r.getSeq[Double](1).forall(_ == 0.0))
  }
}
