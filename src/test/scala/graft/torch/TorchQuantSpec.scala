package graft.torch

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TorchQuant]]'s int8 grid: every dequantized weight is an
  * integer multiple of maxabs/127 with |code| <= 127, quantization is
  * idempotent (the grid is a fixed point), zero tensors pass through,
  * and non-matmul parameters (biases, embeddings, LayerNorm) are
  * untouched. */
class TorchQuantSpec extends AnyFunSuite {

  test("dequantized weights sit on the int8 grid; idempotent; zero passthrough") {
    val w = Array(0.5f, -1.25f, 0.0625f, 1.0f, -0.875f, 0.33f)
    val dq = TorchQuant.int8Dequant(w)
    val s = w.map(math.abs).max / 127.0f
    dq.foreach { v =>
      val code = math.round(v / s)
      assert(math.abs(code) <= 127 && math.abs(code * s - v) < 1e-7,
        s"$v not on the grid (code $code, scale $s)")
    }
    // max-magnitude weight is exactly representable (code ±127)
    assert(dq(1) == -1.25f)
    assert(TorchQuant.int8Dequant(dq).toSeq == dq.toSeq, "not idempotent")
    assert(TorchQuant.int8Dequant(Array(0f, 0f)).toSeq == Seq(0f, 0f))
  }

  test("quantizeInt8 touches matmul weights only; decoder agreement perfect on the dyadic fixture") {
    val m = graft.SparkEntry.decModel
    val q = TorchQuant.quantizeInt8(m)
    val fcF = m.ops.collect { case l: LinearLayer => l }.last
    val fcQ = q.ops.collect { case l: LinearLayer => l }.last
    assert(fcF.bias.toSeq == fcQ.bias.toSeq, "bias must stay fp32")
    val eF = m.seqHead.get
    val eQ = q.seqHead.get
    assert(eF.weight.toSeq == eQ.weight.toSeq, "embedding must stay fp32")
    val lnF = m.ops.collect { case l: SeqLayerNormOp => l }
    val lnQ = q.ops.collect { case l: SeqLayerNormOp => l }
    assert(lnF.zip(lnQ).forall { case (a, b) =>
      a.gamma.toSeq == b.gamma.toSeq && a.beta.toSeq == b.beta.toSeq })
    // attention weights really did move onto a grid (scale changes them
    // unless already representable — at least the structure changed type)
    val hF = m.ops.collectFirst { case a: EncoderAttnOp => a }.get.heads.head
    val hQ = q.ops.collectFirst { case a: EncoderAttnOp => a }.get.heads.head
    assert(hF.bq.toSeq == hQ.bq.toSeq, "attention bias must stay fp32")
    val sWq = hF.wq.map(math.abs).max / 127.0f
    hQ.wq.foreach(v => assert(math.abs(math.round(v / sWq) * sWq - v) < 1e-6))
  }

  test("q198 agreement rate is total on the 1/16-grid fixture (int8 grid is finer)") {
    lazy val spark = graft.SparkTestSession.spark
    val df = graft.SparkEntry.queries("q198_torch_ptq")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)),
      "dyadic 1/16 weights must survive int8 quantization with zero flips")
  }
}
