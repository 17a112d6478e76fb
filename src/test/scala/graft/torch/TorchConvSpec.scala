package graft.torch

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q128's numerical-safety contract: the engine's path — PGM bytes ->
  * PixelDecoder -> u8/255 f32 -> f64 conv with per-value f32 rounding
  * -> fc — must agree with an independent all-f64 recompute FROM THE
  * CLOSED-FORM PIXEL FORMULA on every doc's argmax (so a decode bug
  * cannot cancel out), and the runner-up gap must clear the drift. */
class TorchConvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sf0.001: engine argmax == f64 conv recompute on every doc; gap floor holds") {
    val m = graft.SparkEntry.convModel
    val cv = m.ops.collectFirst { case c: Conv2dOp => c }.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val rows = graft.SparkEntry.queries("q128_torch_conv2d")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    var minGap = Double.MaxValue
    for (r <- rows) {
      val docId = r.getLong(0)
      def px(rr: Int, cc: Int): Double =
        (((docId * 2654435761L) ^ (rr * 40503L + cc * 9973L + docId * 7919L)) % 256) / 255.0
      val pooled = Array.tabulate(cv.outCh) { oc =>
        var mx = Double.NegativeInfinity
        for (i <- 0 until 7; j <- 0 until 7) {
          var acc: Double = cv.bias(oc)
          for (rr <- 0 until cv.kh; q <- 0 until cv.kw)
            acc += cv.weight((oc * cv.kh + rr) * cv.kw + q) * px(i + rr, j + q)
          mx = math.max(mx, math.max(0.0, acc))
        }
        mx
      }
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until cv.outCh).map(j => pooled(j) * fc.weight(o * cv.outCh + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(r.getInt(1) == cls, s"doc $docId: engine ${r.getInt(1)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"argmax gap floor violated: $minGap")
  }
}
