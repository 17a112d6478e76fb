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

  test("sf0.001 depthwise: engine argmax == f64 grouped recompute; dense recompute differs; gap floor holds") {
    val m = graft.SparkEntry.mobileModel
    val convs = m.ops.collect { case c: Conv2dOp => c }
    val (pw1, dw, pw2) = (convs(0), convs(1), convs(2))
    assert(dw.groups == dw.inCh && dw.groups == dw.outCh) // genuinely depthwise
    val aff = m.ops.collectFirst { case a: ChannelAffineOp => a }.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val rows = graft.SparkEntry.queries("q140_torch_depthwise")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    var minGap = Double.MaxValue
    var denseDiffers = 0
    for (r <- rows) {
      val docId = r.getLong(0)
      def px(rr: Int, cc: Int): Double =
        (((docId * 2246822519L) ^ (rr * 30011L + cc * 12007L + docId * 5003L)) % 256) / 255.0
      // pointwise expand + relu
      val e = Array.tabulate(pw1.outCh, 8, 8)((c, i, j) =>
        math.max(0.0, pw1.bias(c) + pw1.weight(c) * px(i, j)))
      // depthwise 3x3 same-padded (channel c reads ONLY e(c)) + affine + relu
      def dwOut(dense: Boolean) = Array.tabulate(dw.outCh, 8, 8) { (c, i, j) =>
        var acc: Double = dw.bias(c)
        for (di <- -1 to 1; dj <- -1 to 1
             if i + di >= 0 && i + di < 8 && j + dj >= 0 && j + dj < 8) {
          if (!dense)
            acc += dw.weight((c * 3 + (di + 1)) * 3 + (dj + 1)) * e(c)(i + di)(j + dj)
          else // what a groups=1 misread would compute: every channel
            for (d0 <- 0 until dw.inCh)
              acc += dw.weight((c * 3 + (di + 1)) * 3 + (dj + 1)) * e(d0)(i + di)(j + dj)
        }
        math.max(0.0, acc * aff.scale(c) + aff.shift(c))
      }
      val d = dwOut(dense = false)
      val dDense = dwOut(dense = true)
      if (d.flatten.flatten.toSeq != dDense.flatten.flatten.toSeq) denseDiffers += 1
      // pointwise reduce + relu, global max pool
      val pooled = Array.tabulate(pw2.outCh) { o =>
        var mx = Double.NegativeInfinity
        for (i <- 0 until 8; j <- 0 until 8) {
          var acc: Double = pw2.bias(o)
          for (c <- 0 until pw2.inCh) acc += pw2.weight(o * pw2.inCh + c) * d(c)(i)(j)
          mx = math.max(mx, math.max(0.0, acc))
        }
        mx
      }
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until pw2.outCh).map(j => pooled(j) * fc.weight(o * pw2.outCh + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(r.getInt(1) == cls, s"doc $docId: engine ${r.getInt(1)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-2, s"argmax gap floor violated: $minGap")
    // the grouped path is numerically distinct from a dense misread on
    // essentially every doc — the oracle match is pinning REAL semantics
    assert(denseDiffers > 450, s"dense recompute matched grouped on ${500 - denseDiffers} docs")
  }
}
