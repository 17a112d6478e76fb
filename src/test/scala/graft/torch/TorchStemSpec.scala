package graft.torch

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * q205's stride-2 stem contract: the engine's strided Conv2d
 * (k=3, stride=2, padding=1 — the torch-idiomatic MobileNet/ResNet
 * downsampling stem; torch itself raises for padding='same' with
 * stride != 1 and the loader matches that) must agree with an
 * independent all-f64 recompute on EVERY document's argmax, with the
 * runner-up gap clearing the pixel-normalization f32 drift by orders
 * of magnitude. Also pins the torch-matching load-time rejection.
 */
class TorchStemSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  /** Closed-form pixel (the q205 synth): integer 0..255 / 255. */
  private def pxI(docId: Long, r: Int, c: Int): Double =
    (((docId * 40503599627L) ^ (r * 20011L + c * 160001L + docId * 9001L)) % 256).toDouble / 255.0

  /** All-f64 stem logits: strided conv (taps at 2i+r-1, zero-padded)
    * -> affine -> relu -> global average -> fc. Pixels are f32-rounded
    * k/255 exactly like the engine's normalization, so the only
    * engine-vs-this drift is the per-op f32 rounding. */
  private def stemLogitsF64(m: TorchScriptModel, docId: Long,
      f32Pixels: Boolean): Array[Double] = {
    val cv = m.ops.collectFirst { case c: Conv2dOp => c }.get
    val aff = m.ops.collectFirst { case a: ChannelAffineOp => a }.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val pooled = new Array[Double](cv.outCh)
    for (oc <- 0 until cv.outCh) {
      var sum = 0.0
      for (i <- 0 until 4; j <- 0 until 4) {
        var acc: Double = cv.bias(oc)
        for (r <- 0 until 3; q <- 0 until 3) {
          val y = 2 * i + r - 1
          val x = 2 * j + q - 1
          if (y >= 0 && y < 8 && x >= 0 && x < 8) {
            val p = if (f32Pixels) pxI(docId, y, x).toFloat.toDouble else pxI(docId, y, x)
            acc += cv.weight((oc * 3 + r) * 3 + q) * p
          }
        }
        sum += math.max(0.0, acc * aff.scale(oc) + aff.shift(oc))
      }
      pooled(oc) = sum / 16.0
    }
    Array.tabulate(fc.outDim)(o =>
      fc.bias(o) + (0 until cv.outCh).map(j => pooled(j) * fc.weight(o * cv.outCh + j)).sum)
  }

  test("sf0.001: q205 engine argmax == f64 strided-stem recompute on every doc; gap floor holds") {
    val m = graft.SparkEntry.stemModel
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q205_torch_stride_stem")(spark, dir).collect()
    assert(rows.length > 0)
    var minGap = Double.MaxValue
    val hist = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    for (r <- rows) {
      val (docId, cls) = (r.getLong(0), r.getInt(1))
      val logits = stemLogitsF64(m, docId, f32Pixels = true)
      val f64cls = logits.indexOf(logits.max)
      assert(cls == f64cls, s"doc $docId: engine $cls vs f64 $f64cls")
      hist(cls) += 1
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    info(s"q205 classes: ${hist.toSeq.sorted}, min runner-up gap: $minGap")
    assert(hist.size >= 2, s"degenerate classifier: $hist")
    assert(minGap > 1e-3, s"stem argmax gap floor violated: $minGap")
  }

  test("padding='same' with stride != 1 fails at load exactly like torch's ValueError") {
    import SptFixture._
    def vals(n: Int, seed: Int): Array[Float] =
      Array.tabulate(n)(i => (math.sin(seed * 97 + i * 13.7) * 0.5).toFloat)
    val model = Module("__torch__.SNet", Seq(
      "training" -> B(false),
      "conv" -> conv2d(vals(36, 41), outCh = 4, inCh = 1, kh = 3, kw = 3,
        bias = vals(4, 43), stride = 2, paddingStr = "same"),
      "fc" -> linear(vals(12, 47), 3, 4, vals(3, 53))))
    val code = Map("code/__torch__.py" ->
      """class SNet(Module):
        |  training : bool
        |  def forward(self: __torch__.SNet,
        |    x: Tensor) -> Tensor:
        |    conv = self.conv
        |    x0 = (conv).forward(x, )
        |    fc = self.fc
        |    return (fc).forward(x0, )
        |""".stripMargin)
    val err = intercept[Exception] {
      TorchScriptModel.load(writeTemp("stridesame", "stridesame", model, code))
    }
    assert(err.getMessage.contains("padding='same' requires stride=1"),
      err.getMessage)
  }
}
