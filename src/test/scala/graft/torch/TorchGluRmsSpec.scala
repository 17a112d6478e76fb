package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q163's numerical-safety contract on real fixture data: the engine's
  * f32-rounded RMSNorm -> GLU -> mean-pool -> fc forward must agree
  * with an independent all-f64 recompute on EVERY document's argmax,
  * and the f64 runner-up gap must clear the drift bound by orders of
  * magnitude. The engine's roundings: one per normed value, one per
  * gated value, one per pooled value (|v| <= ~4 -> ~2e-7 absolute
  * each), plus the f32 fc GEMM and cross-libm sigmoid exp ulps — a
  * 1e-4 gap floor is >100x the accumulated bound (measured sf0.01
  * min gap 1.1e-3, sf0.001 floor asserted here). */
class TorchGluRmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("q163 sf0.001: engine argmax == f64 recompute on every doc; gap floor holds") {
    val m = graft.SparkEntry.gluRmsModel
    val e = m.seqHead.get
    val rn = m.ops.collectFirst { case r: SeqRmsNormOp => r }.get
    val fc = m.ops.collectFirst { case l: LinearLayer => l }.get
    val E = e.embDim
    val half = E / 2

    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q163_torch_glu_rms")(spark, dir).collect()
    assert(rows.length > 0)
    val engine = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap

    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % e.vocab)
          .as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toInt).toArray)
    assert(toks.length == engine.size)

    var minGap = Double.MaxValue
    for ((docId, ids) <- toks) {
      val L = ids.length
      // per-position: RMSNorm then GLU, all-f64
      val pooled = new Array[Double](half)
      for (p <- 0 until L) {
        val x = Array.tabulate(E)(j => e.weight(ids(p) * E + j).toDouble)
        var ms = 0.0
        for (j <- 0 until E) ms += x(j) * x(j)
        ms /= E
        val inv = 1.0 / math.sqrt(ms + rn.eps)
        for (j <- 0 until half) {
          val a = x(j) * inv * rn.gamma(j)
          val b = x(half + j) * inv * rn.gamma(half + j)
          pooled(j) += a * (1.0 / (1.0 + math.exp(-b)))
        }
      }
      for (j <- 0 until half) pooled(j) /= L
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until fc.inDim).map(j =>
          pooled(j) * fc.weight(o * fc.inDim + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-4, s"argmax gap floor violated: $minGap")
  }
}
