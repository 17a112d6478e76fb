package graft.torch

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q131's numerical-safety contract: the engine's path — PGM bytes ->
  * PixelDecoder -> u8/255 f32 -> stem conv -> fused residual block
  * (each stage rounding f32 at its boundary) -> avg pool -> fc — must
  * agree with an independent all-f64 recompute FROM THE CLOSED-FORM
  * PIXEL FORMULA on every doc's argmax, with the runner-up gap
  * clearing the stacked-conv drift (~1e-5) by orders of magnitude. */
class TorchResnetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sf0.001: engine argmax == f64 resnet recompute on every doc; gap floor holds") {
    val m = graft.SparkEntry.resnetModel
    val stem = m.ops.collectFirst { case c: Conv2dOp => c }.get
    val blk = m.ops.collectFirst { case b: ResBlock2dOp => b }.get
    val convs = blk.stages.collect { case c: Conv2dOp => c }
    val affs = blk.stages.collect { case a: ChannelAffineOp => a }
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val rows = graft.SparkEntry.queries("q131_torch_resnet")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    val (h, w) = (8, 8)
    var minGap = Double.MaxValue
    for (r <- rows) {
      val docId = r.getLong(0)
      def px(rr: Int, cc: Int): Double =
        (((docId * 1099511627791L) ^ (rr * 52501L + cc * 8191L + docId * 6007L)) % 256) / 255.0
      def conv(in: (Int, Int) => Array[Double], cv: Conv2dOp): Array[Array[Double]] = {
        val out = Array.ofDim[Double](h * w, cv.outCh)
        for (i <- 0 until h; j <- 0 until w; o <- 0 until cv.outCh) {
          var acc: Double = cv.bias(o)
          for (di <- -1 to 1; dj <- -1 to 1
               if i + di >= 0 && i + di < h && j + dj >= 0 && j + dj < w;
               d <- 0 until cv.inCh)
            acc += cv.weight(((o * cv.inCh + d) * 3 + (di + 1)) * 3 + (dj + 1)) *
              in(i + di, j + dj)(d)
          out(i * w + j)(o) = acc
        }
        out
      }
      val pxIn = (i: Int, j: Int) => Array(px(i, j))
      val s0 = conv(pxIn, stem).map(_.map(v => math.max(0.0, v)))
      def aff(x: Array[Array[Double]], a: ChannelAffineOp, relu: Boolean) =
        x.map(_.zipWithIndex.map { case (v, c) =>
          val y = v * a.scale(c) + a.shift(c)
          if (relu) math.max(0.0, y) else y
        })
      val r1 = aff(conv((i, j) => s0(i * w + j), convs(0)), affs(0), relu = true)
      val r2 = aff(conv((i, j) => r1(i * w + j), convs(1)), affs(1), relu = false)
      val res = Array.tabulate(h * w, 3)((p, c) => math.max(0.0, s0(p)(c) + r2(p)(c)))
      val pooled = Array.tabulate(3)(c => (0 until h * w).map(p => res(p)(c)).sum / (h * w))
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until 3).map(j => pooled(j) * fc.weight(o * 3 + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(r.getInt(1) == cls, s"doc $docId: engine ${r.getInt(1)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"argmax gap floor violated: $minGap")
  }
}
