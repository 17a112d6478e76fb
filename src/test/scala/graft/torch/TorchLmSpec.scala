package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q134's numerical-safety contract on real fixture data (the LM-
  * perplexity analogue of TorchRnnSpec's argmax-gap pinning): the
  * engine's mean next-token NLL must agree with an independent all-f64
  * recompute on EVERY document to within the cross-implementation drift
  * budget (both sides are pure f64; the only divergence sources are
  * summation-order ulps, ~1e-13 relative), the keep decision
  * (`mean_nll < LmKeepBelow`) must agree everywhere, and the margin
  * from every UNROUNDED mean to the 4.1875 threshold must clear a
  * pinned floor that is >1e9 times the drift budget — so fixture or
  * weight changes that push a doc near the threshold fail HERE, not as
  * a silent cross-engine keep flip in the DuckDB gate.
  *
  * Measured margins: sf0.001 min |mean_nll - 4.1875| = 2.25e-3,
  * sf0.01 = 4.21e-3 (500 docs); floors pinned at 2e-3 / 4e-3.
  */
class TorchLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Thr = graft.SparkEntry.LmKeepBelow.toDouble

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))

  /** Independent f64 teacher-forced mean NLL (functional style, distinct
    * from TorchScriptModel.lmMeanNll's imperative loops). */
  private def refMeanNll(m: TorchScriptModel, ids: Array[Int]): Double = {
    val e = m.seqHead.get
    val op = m.ops.collectFirst { case r: RnnOp => r }.get
    val fc = m.ops.collectFirst { case l: LinearLayer => l }.get
    val H = op.hidden
    var h = new Array[Double](H)
    var nll = 0.0
    for (t <- 0 until ids.length - 1) {
      val x = Array.tabulate(e.embDim)(j => e.weight(ids(t) * e.embDim + j).toDouble)
      def ih(g: Int, o: Int) = op.bIh(g * H + o) +
        (0 until op.inDim).map(j => op.wIh((g * H + o) * op.inDim + j).toDouble * x(j)).sum
      def hh(g: Int, o: Int) = op.bHh(g * H + o) +
        (0 until H).map(j => op.wHh((g * H + o) * H + j).toDouble * h(j)).sum
      h = Array.tabulate(H) { o =>
        val r = sigmoid(ih(0, o) + hh(0, o))
        val z = sigmoid(ih(1, o) + hh(1, o))
        val n = math.tanh(ih(2, o) + r * hh(2, o))
        (1.0 - z) * n + z * h(o)
      }
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until H).map(j => fc.weight(o * H + j).toDouble * h(j)).sum)
      val mx = logits.max
      nll += mx + math.log(logits.map(l => math.exp(l - mx)).sum) - logits(ids(t + 1))
    }
    nll / (ids.length - 1)
  }

  private def check(dir: String, marginFloor: Double): Unit = {
    val m = graft.SparkEntry.gruLmModel
    val e = m.seqHead.get
    // engine path: the unrounded mean straight out of scoreLmBatched
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % e.vocab),
          1, 12).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 2)
    val bc = spark.sparkContext.broadcast(m)
    val engine = Torch.scoreLmBatched(toks, "tok_ids", "mean_nll", bc)
      .select(col("doc_id"), col("tok_ids"), col("mean_nll"))
      .collect()
    assert(engine.length > 0)
    var minMargin = Double.MaxValue
    var kept = 0
    for (r <- engine) {
      val ids = r.getSeq[Int](1).toArray
      val eng = r.getDouble(2)
      val ref = refMeanNll(m, ids)
      assert(math.abs(eng - ref) < 1e-11,
        s"doc ${r.getLong(0)}: engine $eng vs f64 recompute $ref")
      assert((eng < Thr) == (ref < Thr),
        s"doc ${r.getLong(0)}: keep decision diverges ($eng vs $ref around $Thr)")
      if (eng < Thr) kept += 1
      minMargin = math.min(minMargin, math.abs(eng - Thr))
    }
    assert(kept > 0 && kept < engine.length,
      s"$dir keep split degenerate: $kept of ${engine.length}")
    assert(minMargin > marginFloor,
      s"$dir keep-threshold margin floor violated: $minMargin <= $marginFloor")
    info(s"$dir: ${engine.length} docs, kept $kept, min margin $minMargin")
  }

  test("sf0.001: engine == f64 recompute on every doc; margin floor 2e-3") {
    check("/root/testdata/sf0.001", 2e-3)
  }

  test("sf0.01: engine == f64 recompute on every doc; margin floor 4e-3") {
    check("/root/testdata/sf0.01", 4e-3)
  }
}
