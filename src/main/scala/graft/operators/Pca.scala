package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Gram buffer: count, per-dimension Σx, and the packed
  * upper triangle of Σ x·xᵀ (`gram(k)` for k = idx(i,j), i <= j). */
final case class GramBuf(n: Long, sum: Array[Double], gram: Array[Double])
    extends Serializable

/**
 * One-pass second-moment (Gram) aggregate over a vector column — the
 * input to covariance/PCA. Same design rationale as
 * [[graft.functions.VecStatsAgg]]: a `posexplode` to (i, j, x_i·x_j)
 * rows would push rows × dim² element-rows through the scan pipeline
 * (4096× the row traffic at dim 64) for a result that is one
 * fixed-size triangle; this buffer is (1 + dim + dim(dim+1)/2)
 * doubles per task, reduce is the O(dim²) triangle loop, merge is an
 * element-wise add — the exchange carries one ~17 KB buffer per map
 * task and nothing row-shaped, so the pass costs the same at 100 TB
 * as the plain scan.
 *
 * Null / wrong-length vectors are REJECTED loudly (require): a
 * silently skipped row corrupts the covariance this op exists to
 * measure.
 */
class GramAgg(dim: Int)
    extends Aggregator[Seq[Float], GramBuf, GramBuf] with Serializable {
  require(dim >= 1, "dim must be >= 1")
  private val triLen = dim * (dim + 1) / 2

  override def zero: GramBuf =
    GramBuf(0L, new Array[Double](dim), new Array[Double](triLen))

  override def reduce(buf: GramBuf, x: Seq[Float]): GramBuf = {
    require(x != null && x.length == dim,
      s"vector length ${if (x == null) "null" else x.length} != dim $dim")
    val v = new Array[Double](dim)
    x match {
      case ix: scala.collection.IndexedSeq[Float] =>
        var i = 0
        while (i < dim) { v(i) = ix(i).toDouble; i += 1 }
      case other =>
        val it = other.iterator
        var i = 0
        while (i < dim) { v(i) = it.next().toDouble; i += 1 }
    }
    val s = buf.sum
    val g = buf.gram
    var i = 0
    var k = 0
    while (i < dim) {
      s(i) += v(i)
      var j = i
      while (j < dim) { g(k) += v(i) * v(j); j += 1; k += 1 }
      i += 1
    }
    GramBuf(buf.n + 1, s, g)
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    val s = a.sum
    val g = a.gram
    var i = 0
    while (i < dim) { s(i) += b.sum(i); i += 1 }
    var k = 0
    while (k < triLen) { g(k) += b.gram(k); k += 1 }
    GramBuf(a.n + b.n, s, g)
  }

  override def finish(buf: GramBuf): GramBuf = buf
  override def bufferEncoder: Encoder[GramBuf] = ExpressionEncoder[GramBuf]()
  override def outputEncoder: Encoder[GramBuf] = ExpressionEncoder[GramBuf]()
}

/**
 * Distributed PCA: covariance from ONE scan-side [[GramAgg]] pass,
 * top principal component by driver-side power iteration over the
 * dim×dim covariance (dim is small — the frozen-artifact discipline:
 * the heavy part is distributed, the d² driver work is constant), and
 * a scan-side centered projection over the fitted component.
 *
 * The training-data uses: embedding whitening / anisotropy removal
 * (dominant-direction subtraction à la all-but-the-top), drift
 * monitoring (is the top component stable release-over-release), and
 * 1-d semantic ordering for locality-preserving shard layout.
 *
 * Numerics contract (the PageRank/q160 recipe): population covariance
 * C = G/n − μμᵀ, power iteration from the uniform init
 * v₀ = 1/√dim with per-step 2-norm renormalization — every step is
 * restatable as one matrix-vector CTE in DuckDB, and the iteration is
 * a contraction toward the dominant eigenvector, so cross-engine
 * sum-order ulps do not amplify; final outputs round at 6 dp.
 */
object Pca {

  /** The group's Gram statistics as one {n, sum, gram} struct. */
  def gram_stats(vec: Column, dim: Int): Column =
    udaf(new GramAgg(dim), ExpressionEncoder[Seq[Float]]())(vec)

  /** Fitted top component: mean, unit eigenvector after `iters` power
    * steps, its Rayleigh quotient (eigenvalue), and trace(C) so
    * callers can report explained-variance ratio. */
  final case class PcaTop(dim: Int, n: Long, mean: Array[Double],
      component: Array[Double], eigenvalue: Double, trace: Double) {
    def explainedVarianceRatio: Double = eigenvalue / trace
  }

  private def triIdx(dim: Int, i: Int, j: Int): Int = {
    // packed upper triangle, rows i of length dim-i
    val (a, b) = if (i <= j) (i, j) else (j, i)
    a * dim - a * (a - 1) / 2 + (b - a)
  }

  /** Dense covariance from a collected GramBuf (population: /n). */
  def covariance(buf: GramBuf, dim: Int): Array[Array[Double]] = {
    require(buf.n > 0, "covariance of an empty input")
    val n = buf.n.toDouble
    val mu = buf.sum.map(_ / n)
    Array.tabulate(dim, dim) { (i, j) =>
      buf.gram(triIdx(dim, i, j)) / n - mu(i) * mu(j)
    }
  }

  /** One aggregation job + O(iters·dim²) driver math. The collect is
    * ONE struct row (capped by construction). */
  def fitTop(df: DataFrame, embCol: String, dim: Int, iters: Int = 8): PcaTop = {
    require(iters >= 1, "iters must be >= 1")
    val row = df.agg(gram_stats(col(embCol), dim).as("g"))
      .selectExpr("g.n AS n", "g.sum AS sum", "g.gram AS gram")
      .head()
    val buf = GramBuf(row.getLong(0),
      row.getSeq[Double](1).toArray, row.getSeq[Double](2).toArray)
    val cov = covariance(buf, dim)
    val mean = buf.sum.map(_ / buf.n.toDouble)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lastW = v
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
      var nsq = 0.0
      var i = 0
      while (i < dim) { nsq += w(i) * w(i); i += 1 }
      val nv = math.sqrt(nsq)
      require(nv > 0.0, "power iteration collapsed: zero covariance action")
      lastW = w
      v = w.map(_ / nv)
      t += 1
    }
    // Rayleigh quotient at the final iterate: v_T · C v_T. v_T is
    // lastW / ||lastW||, so compute one more matvec for exactness.
    val cw = Array.tabulate(dim) { i =>
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
      acc
    }
    var lambda = 0.0
    var tr = 0.0
    var i = 0
    while (i < dim) { lambda += v(i) * cw(i); tr += cov(i)(i); i += 1 }
    PcaTop(dim, buf.n, mean, v, lambda, tr)
  }

  /**
   * Semantic shard layout eval: bucket rows into `shards` equal-WIDTH
   * tiles of the (6-dp quantized) top-component projection and
   * measure each shard's coherence as the mean cosine of members to
   * their shard centroid, beside a global-centroid baseline row
   * (shard −1). Locality-preserving layout is the curriculum /
   * cache-locality / co-access story at 100 TB — this op puts a
   * NUMBER on how much 1-d semantic ordering buys.
   *
   * Scale shape: no global ordered window (equal-width buckets from a
   * broadcast one-row min/max, not ntile), centroids via the
   * fixed-buffer [[graft.functions.VecStatsAgg]] on the shard key,
   * cosines scan-side against the broadcast centroids. Quantizing the
   * projection before bucketing keeps membership engine-independent.
   */
  def pc1ShardCoherence(
      df: DataFrame, idCol: String, embCol: String,
      model: PcaTop, shards: Int): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val spark = df.sparkSession
    val p6 = round(projectTop(model, col(embCol)), 6)
    val base = df.select(col(idCol).as("id"),
      col(embCol).as("ef"), // float layout for the moments buffer
      col(embCol).cast("array<double>").as("e"), p6.as("p6"))
    val mm = base.agg(min("p6").as("lo"), max("p6").as("hi"))
    val sharded = base.crossJoin(broadcast(mm))
      .withColumn("shard",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(floor((col("p6") - col("lo")) / (col("hi") - col("lo"))
            * shards), lit(shards - 1)).cast("int")))
      .select("id", "ef", "e", "shard")
    def coherence(in: DataFrame, key: Column): DataFrame = {
      val cents = in.groupBy(key.as("shard"))
        .agg(graft.functions.VecStatsAgg.vec_stats(col("ef"), model.dim).as("st"))
        .select(col("shard"),
          transform(col("st.sum"), s => s / col("st.n")).as("centroid"))
      in.withColumn("shard", key)
        .join(broadcast(cents), "shard")
        .withColumn("cos", graft.functions.CosineSim.cosine_sim(
          spark, col("e"), col("centroid")))
        .groupBy("shard")
        .agg(count(lit(1)).as("n"), round(avg("cos"), 6).as("coherence"))
    }
    coherence(sharded, col("shard"))
      .unionAll(coherence(sharded, lit(-1)))
      .orderBy("shard")
  }

  /** All-but-the-top residual (Mu & Viswanath 2018): ‖x − p·v‖ after
    * removing the dominant-direction component, p the CENTERED
    * projection. Removing the anisotropic common direction is the
    * standard embedding post-process before cosine retrieval. `p`
    * must be a materialized column (compute it once with
    * [[projectTop]]); the element-wise form mirrors the oracle's sum
    * of squares instead of the algebraic expansion, so cross-engine
    * agreement doesn't hinge on cancellation. */
  def residualNorm(model: PcaTop, vec: Column, p: Column): Column =
    sqrt(aggregate(
      zip_with(vec.cast("array<double>"), typedLit(model.component.toSeq),
        (x, vi) => (x - p * vi) * (x - p * vi)),
      lit(0.0), (acc, t) => acc + t))

  /** Centered scan-side projection x·v − μ·v as a literal-vector HOF
    * (left-to-right f64 accumulation — the randomProject contract). */
  def projectTop(model: PcaTop, vec: Column): Column = {
    var c = 0.0
    var i = 0
    while (i < model.dim) { c += model.mean(i) * model.component(i); i += 1 }
    aggregate(
      zip_with(vec.cast("array<double>"), typedLit(model.component.toSeq),
        (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x) - lit(c)
  }
}
