package graft.torch

import org.scalatest.funsuite.AnyFunSuite

class TorchScriptModelSpec extends AnyFunSuite {
  val modelPath = "/root/reference/model/iris.spt"

  test("loads iris.spt with the archive's layer shapes") {
    val m = TorchScriptModel.load(modelPath)
    // Shapes as recorded in the archive's data.pkl:
    // Linear(4,128) -> ReLU -> Linear(128,64) -> ReLU -> Linear(64,3)
    assert(m.layers.map(l => (l.outDim, l.inDim)) == Seq((128, 4), (64, 128), (3, 64)))
    assert(m.layers.map(_.bias.length) == Seq(128, 64, 3))
    assert(m.inDim == 4 && m.outDim == 3)
    // weights finite
    assert(m.layers.forall(l => l.weight.forall(f => !f.isNaN && !f.isInfinite)))
  }

  test("non-TorchScript input fails loudly, not with garbage weights") {
    val tmp = java.nio.file.Files.createTempFile("not_a_model", ".spt")
    java.nio.file.Files.write(tmp, "definitely not a zip archive".getBytes)
    intercept[Exception] { TorchScriptModel.load(tmp.toString) }
    // a parquet file is a well-formed non-TorchScript binary
    intercept[Exception] {
      TorchScriptModel.load("/root/reference/data/iris.snappy.parquet")
    }
  }

  test("forward produces 3 logits and batched == row-at-a-time") {
    val m = TorchScriptModel.load(modelPath)
    val rows = Array(
      Array(5.1f, 3.5f, 1.4f, 0.2f), // classic setosa
      Array(7.0f, 3.2f, 4.7f, 1.4f), // versicolor
      Array(6.3f, 3.3f, 6.0f, 2.5f)) // virginica
    val single = rows.map(m.forward)
    assert(single.forall(_.length == 3))
    val flat = rows.flatten
    val batched = m.forwardBatch(flat, 3)
    assert(batched.length == 9)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(batched(i * 3 + j) - single(i)(j)) < 1e-5f)
  }

  test("setosa row classifies as class 0") {
    val m = TorchScriptModel.load(modelPath)
    val logits = m.forward(Array(5.1f, 3.5f, 1.4f, 0.2f))
    assert(logits.indexOf(logits.max) == 0)
  }
}
