package graft.torch

import org.scalatest.funsuite.AnyFunSuite
import SptFixture._

/**
 * The widened TorchScript surface: activations beyond ReLU, nested
 * Sequential, shared modules, getattr-style container code, and the
 * codeless-archive fallback. Golden values are computed in-test with
 * independent double-precision math (erf via numerical integration,
 * not the production approximation).
 */
class TorchCodeSpec extends AnyFunSuite {

  // ---- independent reference math (double precision) ----
  private def mm(x: Array[Double], w: Array[Float], b: Array[Float],
      out: Int, in: Int): Array[Double] = {
    require(x.length == in)
    Array.tabulate(out) { o =>
      var acc = b(o).toDouble
      var k = 0
      while (k < in) { acc += x(k) * w(o * in + k); k += 1 }
      acc
    }
  }
  private def sigmoid(x: Array[Double]) = x.map(v => 1.0 / (1.0 + math.exp(-v)))
  private def tanhV(x: Array[Double]) = x.map(math.tanh)
  private def softmax(x: Array[Double]) = {
    val m = x.max; val e = x.map(v => math.exp(v - m)); val s = e.sum; e.map(_ / s)
  }
  private def logSoftmax(x: Array[Double]) = {
    val m = x.max; val lse = math.log(x.map(v => math.exp(v - m)).sum)
    x.map(v => v - m - lse)
  }
  /** erf by Simpson integration — independent of the production
   * Abramowitz-Stegun approximation. */
  private def erfRef(z: Double): Double = {
    val n = 2000
    val (a, b) = (0.0, math.abs(z))
    val h = (b - a) / n
    var s = 0.0
    for (i <- 0 to n) {
      val x = a + i * h
      val f = math.exp(-x * x)
      s += (if (i == 0 || i == n) f else if (i % 2 == 1) 4 * f else 2 * f)
    }
    val v = 2.0 / math.sqrt(math.Pi) * s * h / 3.0
    if (z >= 0) v else -v
  }
  private def gelu(x: Array[Double]) = x.map(v => 0.5 * v * (1.0 + erfRef(v / math.sqrt(2.0))))

  // deterministic "weights" with varied signs/magnitudes
  private def vals(n: Int, seed: Int): Array[Float] =
    Array.tabulate(n)(i => (math.sin(seed * 97 + i * 13.7) * 1.5).toFloat)

  test("sigmoid/tanh/softmax net with nested Sequential and a shared activation") {
    // Net: seq[Linear(3→4), Sigmoid] → tanh → Linear(4→4) → tanh(shared) →
    //      Linear(4→2) → Softmax(dim=-1)
    val (w0, b0) = (vals(12, 1), vals(4, 2))
    val (w1, b1) = (vals(16, 3), vals(4, 4))
    val (w2, b2) = (vals(8, 5), vals(2, 6))
    val model = Module("__torch__.Net", Seq(
      "training" -> B(false),
      "seq" -> Module(SequentialCls, Seq(
        "0" -> linear(w0, 4, 3, b0),
        "1" -> Module(SigmoidCls, Seq("training" -> B(false))),
        "training" -> B(false))),
      "mid" -> linear(w1, 4, 4, b1),
      "act" -> Module(TanhCls, Seq("training" -> B(false))),
      "out" -> linear(w2, 2, 4, b2),
      "soft" -> Module(SoftmaxCls, Seq("dim" -> I(-1), "training" -> B(false)))))
    val code = Map("code/__torch__.py" ->
      """class Net(Module):
        |  __parameters__ = []
        |  training : bool
        |  def forward(self: __torch__.Net,
        |    x: Tensor) -> Tensor:
        |    seq = self.seq
        |    x0 = (seq).forward(x, )
        |    act = self.act
        |    x1 = (act).forward(x0, )
        |    mid = self.mid
        |    x2 = (act).forward((mid).forward(x1, ), )
        |    out = self.out
        |    x3 = (out).forward(x2, )
        |    soft = self.soft
        |    return (soft).forward(x3, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("signet", "signet", model, code))

    assert(m.ops.collect { case ActOp(k) => k } == Seq("sigmoid", "tanh", "tanh"))
    assert(m.ops.last == SoftmaxOp(log = false))
    assert(m.layers.map(l => (l.outDim, l.inDim)) == Seq((4, 3), (4, 4), (2, 4)))

    val x = Array(0.3, -1.2, 2.1)
    val expected = softmax(
      mm(tanhV(mm(tanhV(sigmoid(mm(x, w0, b0, 4, 3))), w1, b1, 4, 4)), w2, b2, 2, 4))
    val got = m.forward(x.map(_.toFloat))
    assert(got.length == 2)
    for (j <- 0 until 2)
      assert(math.abs(got(j) - expected(j)) < 1e-5, s"out[$j]: ${got(j)} vs ${expected(j)}")
    assert(math.abs(got.map(_.toDouble).sum - 1.0) < 1e-6) // softmax normalizes
  }

  test("gelu + log-softmax with getattr-style serialized Sequential code") {
    val (w0, b0) = (vals(6, 7), vals(3, 8))
    val model = Module("__torch__.GNet", Seq(
      "training" -> B(false),
      "blk" -> Module(SequentialCls, Seq(
        "0" -> linear(w0, 3, 2, b0),
        "1" -> Module(GeluCls, Seq("training" -> B(false))),
        "training" -> B(false))),
      "ls" -> Module(LogSoftmaxCls, Seq("dim" -> I(-1), "training" -> B(false)))))
    val code = Map(
      "code/__torch__.py" ->
        """class GNet(Module):
          |  training : bool
          |  def forward(self: __torch__.GNet,
          |    x: Tensor) -> Tensor:
          |    blk = self.blk
          |    x0 = (blk).forward(x, )
          |    ls = self.ls
          |    return (ls).forward(x0, )
          |""".stripMargin,
      "code/__torch__/torch/nn/modules/container.py" ->
        """class Sequential(Module):
          |  training : bool
          |  def forward(self: __torch__.torch.nn.modules.container.Sequential,
          |    input: Tensor) -> Tensor:
          |    _0 = getattr(self, "0")
          |    _1 = getattr(self, "1")
          |    input0 = (_0).forward(input, )
          |    input1 = (_1).forward(input0, )
          |    return input1
          |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("gnet", "gnet", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      Seq("LinearLayer", "ActOp", "SoftmaxOp"))

    val x = Array(-0.7, 1.9)
    val expected = logSoftmax(gelu(mm(x, w0, b0, 3, 2)))
    val got = m.forward(x.map(_.toFloat))
    for (j <- 0 until 3)
      assert(math.abs(got(j) - expected(j)) < 1e-5, s"out[$j]: ${got(j)} vs ${expected(j)}")
  }

  test("functional-form activations (torch.relu / torch.softmax) in user code") {
    val (w0, b0) = (vals(6, 9), vals(3, 10))
    val model = Module("__torch__.FNet", Seq(
      "training" -> B(false),
      "fc" -> linear(w0, 3, 2, b0)))
    val code = Map("code/__torch__.py" ->
      """class FNet(Module):
        |  training : bool
        |  def forward(self: __torch__.FNet,
        |    x: Tensor) -> Tensor:
        |    fc = self.fc
        |    x0 = torch.relu((fc).forward(x, ), )
        |    _0 = torch.softmax(x0, -1, )
        |    return _0
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("fnet", "fnet", model, code))
    val x = Array(1.1, -0.4)
    val expected = softmax(mm(x, w0, b0, 3, 2).map(v => math.max(0.0, v)))
    val got = m.forward(x.map(_.toFloat))
    for (j <- 0 until 3) assert(math.abs(got(j) - expected(j)) < 1e-5)
  }

  test("eval-mode BatchNorm1d and LayerNorm between linears") {
    val (w0, b0) = (vals(8, 15), vals(4, 16))
    val (w1, b1) = (vals(8, 17), vals(2, 18))
    val bnMean = vals(4, 19)
    val bnVar = bnMean.map(v => v * v + 0.5f) // positive variances
    val bnG = vals(4, 20)
    val bnB = vals(4, 21)
    val lnG = vals(2, 22)
    val lnB = vals(2, 23)
    val eps = 1e-5
    val model = Module("__torch__.BNet", Seq(
      "training" -> B(false),
      "fc1" -> linear(w0, 4, 2, b0),
      "bn" -> Module("__torch__.torch.nn.modules.batchnorm.BatchNorm1d", Seq(
        "weight" -> Tensor(Seq(4), bnG),
        "bias" -> Tensor(Seq(4), bnB),
        "running_mean" -> Tensor(Seq(4), bnMean),
        "running_var" -> Tensor(Seq(4), bnVar),
        "eps" -> F(eps),
        "training" -> B(false))),
      "fc2" -> linear(w1, 2, 4, b1),
      "ln" -> Module("__torch__.torch.nn.modules.normalization.LayerNorm", Seq(
        "weight" -> Tensor(Seq(2), lnG),
        "bias" -> Tensor(Seq(2), lnB),
        "eps" -> F(eps),
        "training" -> B(false)))))
    val code = Map("code/__torch__.py" ->
      """class BNet(Module):
        |  training : bool
        |  def forward(self: __torch__.BNet,
        |    x: Tensor) -> Tensor:
        |    fc1 = self.fc1
        |    bn = self.bn
        |    x0 = (bn).forward((fc1).forward(x, ), )
        |    fc2 = self.fc2
        |    x1 = (fc2).forward(x0, )
        |    ln = self.ln
        |    return (ln).forward(x1, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("bnet", "bnet", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      Seq("LinearLayer", "ScaleShiftOp", "LinearLayer", "LayerNormOp"))

    val x = Array(0.9, -1.4)
    val h = mm(x, w0, b0, 4, 2)
    val bn = h.indices.map { i =>
      (h(i) - bnMean(i)) / math.sqrt(bnVar(i).toDouble + eps) * bnG(i) + bnB(i)
    }.toArray
    val l2 = mm(bn, w1, b1, 2, 4)
    val mean = l2.sum / 2
    val variance = l2.map(v => (v - mean) * (v - mean)).sum / 2
    val expected = l2.indices.map { j =>
      (l2(j) - mean) / math.sqrt(variance + eps) * lnG(j) + lnB(j)
    }
    val got = m.forward(x.map(_.toFloat))
    for (j <- 0 until 2)
      assert(math.abs(got(j) - expected(j)) < 1e-4, s"out[$j]: ${got(j)} vs ${expected(j)}")
  }

  test("parameterized activations: SiLU, LeakyReLU, ELU, Hardtanh, Softplus chain") {
    val (w0, b0) = (vals(9, 25), vals(3, 26))
    val model = Module("__torch__.PNet", Seq(
      "training" -> B(false),
      "fc" -> linear(w0, 3, 3, b0),
      "silu" -> Module("__torch__.torch.nn.modules.activation.SiLU",
        Seq("training" -> B(false))),
      "lrelu" -> Module("__torch__.torch.nn.modules.activation.LeakyReLU",
        Seq("negative_slope" -> F(0.2), "training" -> B(false))),
      "elu" -> Module("__torch__.torch.nn.modules.activation.ELU",
        Seq("alpha" -> F(1.5), "training" -> B(false))),
      "ht" -> Module("__torch__.torch.nn.modules.activation.Hardtanh",
        Seq("min_val" -> F(-0.5), "max_val" -> F(0.6), "training" -> B(false))),
      "sp" -> Module("__torch__.torch.nn.modules.activation.Softplus",
        Seq("beta" -> F(2.0), "threshold" -> F(20.0), "training" -> B(false)))))
    val code = Map("code/__torch__.py" ->
      """class PNet(Module):
        |  training : bool
        |  def forward(self: __torch__.PNet,
        |    x: Tensor) -> Tensor:
        |    fc = self.fc
        |    silu = self.silu
        |    x0 = (silu).forward((fc).forward(x, ), )
        |    lrelu = self.lrelu
        |    x1 = (lrelu).forward(x0, )
        |    elu = self.elu
        |    x2 = (elu).forward(x1, )
        |    ht = self.ht
        |    x3 = (ht).forward(x2, )
        |    sp = self.sp
        |    return (sp).forward(x3, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("pnet", "pnet", model, code))
    assert(m.ops.collect { case ParamActOp(k, a, b) => (k, a, b) } ==
      Seq(("leaky_relu", 0.2, 0.0), ("elu", 1.5, 0.0),
        ("hardtanh", -0.5, 0.6), ("softplus", 2.0, 20.0)))

    val x = Array(0.8, -1.1, 0.3)
    def silu(v: Double) = v / (1.0 + math.exp(-v))
    def lrelu(v: Double) = if (v < 0) 0.2 * v else v
    def elu(v: Double) = if (v < 0) 1.5 * (math.exp(v) - 1) else v
    def ht(v: Double) = math.max(-0.5, math.min(0.6, v))
    def sp(v: Double) = if (2.0 * v <= 20.0) math.log1p(math.exp(2.0 * v)) / 2.0 else v
    val expected = mm(x, w0, b0, 3, 3).map(silu).map(lrelu).map(elu).map(ht).map(sp)
    val got = m.forward(x.map(_.toFloat))
    for (j <- 0 until 3)
      assert(math.abs(got(j) - expected(j)) < 1e-5, s"out[$j]: ${got(j)} vs ${expected(j)}")
  }

  test("codeless archive falls back to Linear/ReLU heuristic; rejects other ops") {
    val (w0, b0) = (vals(6, 11), vals(3, 12))
    val (w1, b1) = (vals(6, 13), vals(2, 14))
    val mlp = Module("__torch__.Plain", Seq(
      "training" -> B(false),
      "fc1" -> linear(w0, 3, 2, b0),
      "fc2" -> linear(w1, 2, 3, b1),
      "relu" -> Module(ReluCls, Seq("training" -> B(false)))))
    val m = TorchScriptModel.load(writeTemp("plain", "plain", mlp, Map.empty))
    // heuristic: ReLU between the linears, logits out
    assert(m.ops == IndexedSeq(m.layers(0), ActOp("relu"), m.layers(1)))
    val x = Array(0.5, -0.25)
    val expected = mm(mm(x, w0, b0, 3, 2).map(v => math.max(0.0, v)), w1, b1, 2, 3)
    val got = m.forward(x.map(_.toFloat))
    for (j <- 0 until 2) assert(math.abs(got(j) - expected(j)) < 1e-5)

    // a codeless archive with a Sigmoid cannot be ordered — loud failure
    val sig = Module("__torch__.Plain2", Seq(
      "fc1" -> linear(w0, 3, 2, b0),
      "sig" -> Module(SigmoidCls, Seq("training" -> B(false)))))
    val e = intercept[RuntimeException] {
      TorchScriptModel.load(writeTemp("plain2", "plain2", sig, Map.empty))
    }
    assert(e.getMessage.contains("unsupported TorchScript op"))
  }

  test("comparison statements fail loudly, not silently misparse as assignment") {
    // '_0 = x == y' must not be read as assigning '= y' after skipping
    // only the first '=' of '==' — the fail-loud contract for
    // unsupported TorchScript surface
    val (w0, b0) = (vals(6, 15), vals(3, 16))
    val model = Module("__torch__.CNet", Seq(
      "training" -> B(false),
      "fc" -> linear(w0, 3, 2, b0)))
    val code = Map("code/__torch__.py" ->
      """class CNet(Module):
        |  training : bool
        |  def forward(self: __torch__.CNet,
        |    x: Tensor) -> Tensor:
        |    fc = self.fc
        |    x0 = (fc).forward(x, )
        |    _0 = x0 == x0
        |    return x0
        |""".stripMargin)
    val e = intercept[RuntimeException] {
      TorchScriptModel.load(writeTemp("cnet", "cnet", model, code))
    }
    // either parse path is acceptable as long as it is LOUD: the
    // standalone comparison hits "unsupported statement", the assigned
    // form hits the expression parser's trailing-input check
    assert(e.getMessage.contains("unsupported") || e.getMessage.contains("trailing input"),
      e.getMessage)
  }

  test("Embedding + mean(dim=1) + MLP: archive traces and executes, golden vs f64 math") {
    // fastText-classifier shape: token ids -> Embedding(10, 4) ->
    // mean over the sequence -> Linear(4->3)
    val vocab = 10; val embDim = 4
    val ew = vals(vocab * embDim, 21)
    val (w0, b0) = (vals(12, 22), vals(3, 23))
    val model = Module("__torch__.FT", Seq(
      "training" -> B(false),
      "emb" -> Module("__torch__.torch.nn.modules.sparse.Embedding", Seq(
        "weight" -> Tensor(Seq(vocab, embDim), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "out" -> linear(w0, 3, 4, b0)))
    val code = Map("code/__torch__.py" ->
      """class FT(Module):
        |  training : bool
        |  def forward(self: __torch__.FT,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    m = torch.mean(e, [1], False, None)
        |    out = self.out
        |    return (out).forward(m, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("ft", "ft", model, code))
    assert(m.inDim == -1 && m.outDim == 3)
    assert(m.ops.head.isInstanceOf[EmbeddingMeanOp])
    val toks = Array(2, 5, 5, 1, 9)
    // independent double math: mean of embedding rows, then the linear
    val pooled = Array.tabulate(embDim) { j =>
      toks.map(t => ew(t * embDim + j).toDouble).sum / toks.length
    }
    val expected = mm(pooled, w0, b0, 3, 4)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 3) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // variable-length batch: rows pool independently
    val batch = m.forwardTokensBatch(Array(toks, Array(0), Array(7, 7)))
    for (j <- 0 until 3) assert(math.abs(batch(j) - expected(j)) < 1e-5)
    // empty token row through Embedding(...).mean(1): 0/0 -> NaN, as
    // torch's mean over an empty dim (contrast the EmbeddingBag test)
    assert(m.forwardTokens(Array.empty[Int]).forall(_.isNaN))
    // out-of-range id fails loudly, like torch's index check
    val oob = intercept[IllegalArgumentException](m.forwardTokens(Array(11)))
    assert(oob.getMessage.contains("out of range"))
    // feature-vector API refuses a token-input model
    assert(intercept[IllegalArgumentException](
      m.forward(Array(1f, 2f))).getMessage.contains("token-input"))
  }

  test("single-head self-attention archive: traces to the fused op, golden vs f64 math") {
    // minimal transformer-encoder classifier: token ids -> Embedding(8, 4)
    // -> {q,k,v} Linear(4->4) -> softmax(q·k^T / 2)·v -> mean(dim=1) ->
    // Linear(4->3); the generated code spells K^T as transpose(k, -2, -1)
    // and the scale as torch.div by a literal
    val vocab = 8; val d = 4
    val ew = vals(vocab * d, 41)
    val (wq, bq) = (vals(16, 42), vals(4, 43))
    val (wk, bk) = (vals(16, 44), vals(4, 45))
    val (wv, bv) = (vals(16, 46), vals(4, 47))
    val (wf, bf) = (vals(12, 48), vals(3, 49))
    val model = Module("__torch__.AttnNet", Seq(
      "training" -> B(false),
      "emb" -> Module("__torch__.torch.nn.modules.sparse.Embedding", Seq(
        "weight" -> Tensor(Seq(vocab, d), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "q" -> linear(wq, 4, 4, bq),
      "k" -> linear(wk, 4, 4, bk),
      "v" -> linear(wv, 4, 4, bv),
      "fc" -> linear(wf, 3, 4, bf)))
    val code = Map("code/__torch__.py" ->
      """class AttnNet(Module):
        |  training : bool
        |  def forward(self: __torch__.AttnNet,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    q = (self.q).forward(e, )
        |    k = (self.k).forward(e, )
        |    v = (self.v).forward(e, )
        |    k0 = torch.transpose(k, -2, -1)
        |    s = torch.matmul(q, k0)
        |    s0 = torch.div(s, 2.)
        |    a = torch.softmax(s0, -1)
        |    o = torch.matmul(a, v)
        |    p = torch.mean(o, [1], False, None)
        |    fc = self.fc
        |    return (fc).forward(p, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("attn", "attn", model, code))
    // trace shape: fused attention, nothing emitted for q/k/v/transpose
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "SelfAttentionOp", "SeqMeanPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val at = m.ops(1).asInstanceOf[SelfAttentionOp]
    assert(at.scale == 0.5 && at.dim == 4 && at.inDim == 4)
    assert(at.wq.toSeq == wq.toSeq && at.wk.toSeq == wk.toSeq && at.wv.toSeq == wv.toSeq)
    // independent double math
    val toks = Array(3, 0, 6, 2, 5)
    val L = toks.length
    val x = Array.tabulate(L, d)((p, j) => ew(toks(p) * d + j).toDouble)
    def proj(w: Array[Float], b: Array[Float]): Array[Array[Double]] =
      Array.tabulate(L, d)((p, o) =>
        b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
    val (qm, km, vm) = (proj(wq, bq), proj(wk, bk), proj(wv, bv))
    val pooled = new Array[Double](d)
    for (a <- 0 until L) {
      val sc = Array.tabulate(L)(b0 => (0 until d).map(j => qm(a)(j) * km(b0)(j)).sum * 0.5)
      val mx = sc.max
      val es = sc.map(s0 => math.exp(s0 - mx))
      val z = es.sum
      for (j <- 0 until d)
        pooled(j) += (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z / L
    }
    val expected = mm(pooled, wf, bf, 3, 4)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 3) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // batch path agrees with the single-row path bit-for-bit
    val batch = m.forwardTokensBatch(Array(toks, Array(1), Array(7, 7)))
    for (j <- 0 until 3) assert(batch(j) == got(j))
    // single-token sequence: softmax over one score is 1, out = v row
    assert(!m.forwardTokens(Array(1)).exists(_.isNaN))
  }

  test("attention pattern misuse fails loudly (matmul without transpose)") {
    val vocab = 4; val d = 2
    val model = Module("__torch__.BadAttn", Seq(
      "training" -> B(false),
      "emb" -> Module("__torch__.torch.nn.modules.sparse.Embedding", Seq(
        "weight" -> Tensor(Seq(vocab, d), vals(vocab * d, 51)),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "q" -> linear(vals(4, 52), 2, 2, vals(2, 53)),
      "v" -> linear(vals(4, 54), 2, 2, vals(2, 55))))
    val code = Map("code/__torch__.py" ->
      """class BadAttn(Module):
        |  training : bool
        |  def forward(self: __torch__.BadAttn,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    q = (self.q).forward(e, )
        |    v = (self.v).forward(e, )
        |    return torch.matmul(q, v)
        |""".stripMargin)
    val e = intercept[RuntimeException] {
      TorchScriptModel.load(writeTemp("badattn", "badattn", model, code))
    }
    assert(e.getMessage.contains("matmul"), e.getMessage)
  }

  test("EmbeddingBag(mode=mean, padding_idx): pads excluded from the mean") {
    val vocab = 8; val embDim = 3
    val ew = vals(vocab * embDim, 31)
    val (w0, b0) = (vals(6, 32), vals(2, 33))
    val model = Module("__torch__.Bag", Seq(
      "training" -> B(false),
      "bag" -> Module("__torch__.torch.nn.modules.sparse.EmbeddingBag", Seq(
        "weight" -> Tensor(Seq(vocab, embDim), ew),
        "mode" -> SptFixture.Str("mean"),
        "padding_idx" -> I(0),
        "training" -> B(false))),
      "out" -> linear(w0, 2, 3, b0)))
    val code = Map("code/__torch__.py" ->
      """class Bag(Module):
        |  training : bool
        |  def forward(self: __torch__.Bag,
        |    x: Tensor) -> Tensor:
        |    bag = self.bag
        |    m = (bag).forward(x, None, )
        |    out = self.out
        |    return (out).forward(m, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("bag", "bag", model, code))
    val toks = Array(0, 3, 0, 6, 2) // two padding entries
    val live = Seq(3, 6, 2)
    val pooled = Array.tabulate(embDim) { j =>
      live.map(t => ew(t * embDim + j).toDouble).sum / live.length
    }
    val expected = mm(pooled, w0, b0, 2, 3)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 2) assert(math.abs(got(j) - expected(j)) < 1e-5)
    // all-padding bag: torch's embedding_bag leaves the zero-init sum
    // (no divide), so the pooled vector is ZERO and the logits are the
    // linear layer's bias — not NaN
    val emptyBag = m.forwardTokens(Array(0, 0))
    val biasOnly = mm(Array.fill(embDim)(0.0), w0, b0, 2, 3)
    for (j <- 0 until 2) assert(math.abs(emptyBag(j) - biasOnly(j)) < 1e-6)
  }

  test("unpooled embedding output and non-dim-1 mean fail loudly at load") {
    val model = Module("__torch__.Raw", Seq(
      "training" -> B(false),
      "emb" -> Module("__torch__.torch.nn.modules.sparse.Embedding", Seq(
        "weight" -> Tensor(Seq(4, 2), vals(8, 41)),
        "training" -> B(false)))))
    def codeWith(body: String) = Map("code/__torch__.py" ->
      s"""class Raw(Module):
         |  training : bool
         |  def forward(self: __torch__.Raw,
         |    x: Tensor) -> Tensor:
         |    emb = self.emb
         |$body
         |""".stripMargin)
    val unpooled = intercept[RuntimeException] {
      TorchScriptModel.load(writeTemp("raw", "raw", model,
        codeWith("    return (emb).forward(x, )")))
    }
    assert(unpooled.getMessage.contains("unpooled"))
    val dim0 = intercept[RuntimeException] {
      TorchScriptModel.load(writeTemp("raw0", "raw0", model,
        codeWith("    e = (emb).forward(x, )\n    return torch.mean(e, [0], False, None)")))
    }
    assert(dim0.getMessage.contains("mean over dims"))
  }

  // ---- independent Conv1d reference math (double precision) ----
  /** conv over (inCh, L) channel-major input; weight (outCh, inCh, k). */
  private def convRef(x: Array[Array[Double]], w: Array[Float], b: Array[Float],
      outCh: Int, inCh: Int, k: Int, stride: Int = 1): Array[Array[Double]] = {
    val l = x(0).length
    val lout = (l - k) / stride + 1
    Array.tabulate(outCh) { c =>
      Array.tabulate(lout) { p =>
        var acc = b(c).toDouble
        for (d <- 0 until inCh; j <- 0 until k)
          acc += w((c * inCh + d) * k + j) * x(d)(p * stride + j)
        acc
      }
    }
  }

  test("TextCNN: Embedding -> transpose -> Conv1d -> relu -> AdaptiveMaxPool1d -> Linear") {
    val vocab = 8; val embDim = 3; val ch = 4; val k = 2
    val ew = vals(vocab * embDim, 51)
    val cw = vals(ch * embDim * k, 52)
    val cb = vals(ch, 53)
    val (w0, b0) = (vals(2 * ch, 54), vals(2, 55))
    val model = Module("__torch__.CNN", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, embDim), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "conv" -> conv1d(cw, ch, embDim, k, cb),
      "pool" -> Module(AdaptiveMaxPool1dCls, Seq(
        "output_size" -> I(1), "training" -> B(false))),
      "fc" -> linear(w0, 2, ch, b0)))
    val code = Map("code/__torch__.py" ->
      """class CNN(Module):
        |  training : bool
        |  def forward(self: __torch__.CNN,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    e0 = torch.transpose(e, 1, 2)
        |    conv = self.conv
        |    c = torch.relu((conv).forward(e0, ), )
        |    pool = self.pool
        |    p = (pool).forward(c, )
        |    p0 = torch.flatten(p, 1)
        |    fc = self.fc
        |    return (fc).forward(p0, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("cnn", "cnn", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) == Seq("EmbeddingSeqOp",
      "TransposeOp$", "Conv1dOp", "ActOp", "SeqMaxPoolOp$", "LinearLayer"))
    assert(m.inDim == -1 && m.outDim == 2)

    val toks = Array(2, 5, 0, 7, 3, 1)
    // reference: channel-major embedded sequence, conv, relu, global max, fc
    val x = Array.tabulate(embDim)(d => toks.map(t => ew(t * embDim + d).toDouble))
    val conv = convRef(x, cw, cb, ch, embDim, k).map(_.map(math.max(0.0, _)))
    val pooled = conv.map(_.max)
    val expected = mm(pooled, w0, b0, 2, ch)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 2)
      assert(math.abs(got(j) - expected(j)) < 1e-5, s"logit $j: ${got(j)} vs ${expected(j)}")

    // variable-length batch: rows convolve and pool independently
    val toks2 = Array(7, 7) // minimum length (== kernel)
    val x2 = Array.tabulate(embDim)(d => toks2.map(t => ew(t * embDim + d).toDouble))
    val conv2 = convRef(x2, cw, cb, ch, embDim, k).map(_.map(math.max(0.0, _)))
    val expected2 = mm(conv2.map(_.max), w0, b0, 2, ch)
    val batch = m.forwardTokensBatch(Array(toks, toks2))
    for (j <- 0 until 2) {
      assert(math.abs(batch(j) - expected(j)) < 1e-5)
      assert(math.abs(batch(2 + j) - expected2(j)) < 1e-5)
    }

    // a row shorter than the kernel fails loudly (torch's output-size check)
    val short = intercept[IllegalArgumentException](m.forwardTokens(Array(3)))
    assert(short.getMessage.contains("need >= 2 tokens"))
    // out-of-range token id fails loudly
    val oob = intercept[IllegalArgumentException](m.forwardTokens(Array(0, 99)))
    assert(oob.getMessage.contains("out of range"))
  }

  test("TextCNN with strided MaxPool1d window between conv and global pool") {
    val vocab = 6; val embDim = 2; val ch = 3; val k = 2
    val ew = vals(vocab * embDim, 61)
    val cw = vals(ch * embDim * k, 62)
    val cb = vals(ch, 63)
    val (w0, b0) = (vals(2 * ch, 64), vals(2, 65))
    val model = Module("__torch__.CNN2", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, embDim), ew),
        "training" -> B(false))),
      "conv" -> conv1d(cw, ch, embDim, k, cb),
      "mp" -> Module(MaxPool1dCls, Seq(
        "kernel_size" -> I(2), "stride" -> I(2), "padding" -> I(0),
        "dilation" -> I(1), "ceil_mode" -> B(false), "training" -> B(false))),
      "pool" -> Module(AdaptiveMaxPool1dCls, Seq(
        "output_size" -> I(1), "training" -> B(false))),
      "fc" -> linear(w0, 2, ch, b0)))
    val code = Map("code/__torch__.py" ->
      """class CNN2(Module):
        |  training : bool
        |  def forward(self: __torch__.CNN2,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e0 = torch.transpose((emb).forward(x, ), 1, 2)
        |    conv = self.conv
        |    c = torch.relu((conv).forward(e0, ), )
        |    mp = self.mp
        |    c0 = (mp).forward(c, )
        |    pool = self.pool
        |    p0 = torch.squeeze((pool).forward(c0, ), -1)
        |    fc = self.fc
        |    return (fc).forward(p0, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("cnn2", "cnn2", model, code))
    assert(m.ops.contains(MaxPool1dOp(2, 2)))

    val toks = Array(1, 4, 2, 0, 5, 3, 1) // L=7 -> conv Lout=6 -> pool 3
    val x = Array.tabulate(embDim)(d => toks.map(t => ew(t * embDim + d).toDouble))
    val conv = convRef(x, cw, cb, ch, embDim, k).map(_.map(math.max(0.0, _)))
    val mp = conv.map(row => row.grouped(2).filter(_.length == 2).map(_.max).toArray)
    val expected = mm(mp.map(_.max), w0, b0, 2, ch)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 2)
      assert(math.abs(got(j) - expected(j)) < 1e-5, s"logit $j: ${got(j)} vs ${expected(j)}")
  }

  test("TextCNN with strided AvgPool1d window: f64-mean windows, golden vs reference") {
    val vocab = 6; val embDim = 2; val ch = 3; val k = 2
    val ew = vals(vocab * embDim, 261)
    val cw = vals(ch * embDim * k, 262)
    val cb = vals(ch, 263)
    val (w0, b0) = (vals(2 * ch, 264), vals(2, 265))
    val model = Module("__torch__.CNN3", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, embDim), ew),
        "training" -> B(false))),
      "conv" -> conv1d(cw, ch, embDim, k, cb),
      "ap" -> Module("__torch__.torch.nn.modules.pooling.AvgPool1d", Seq(
        "kernel_size" -> I(2), "stride" -> I(2), "padding" -> I(0),
        "ceil_mode" -> B(false), "count_include_pad" -> B(true),
        "training" -> B(false))),
      "pool" -> Module(AdaptiveMaxPool1dCls, Seq(
        "output_size" -> I(1), "training" -> B(false))),
      "fc" -> linear(w0, 2, ch, b0)))
    val code = Map("code/__torch__.py" ->
      """class CNN3(Module):
        |  training : bool
        |  def forward(self: __torch__.CNN3,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e0 = torch.transpose((emb).forward(x, ), 1, 2)
        |    conv = self.conv
        |    c = torch.relu((conv).forward(e0, ), )
        |    ap = self.ap
        |    c0 = (ap).forward(c, )
        |    pool = self.pool
        |    p0 = torch.squeeze((pool).forward(c0, ), -1)
        |    fc = self.fc
        |    return (fc).forward(p0, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("cnn3", "cnn3", model, code))
    assert(m.ops.contains(AvgPool1dOp(2, 2)))
    val toks = Array(1, 4, 2, 0, 5, 3, 1) // L=7 -> conv Lout=6 -> pool 3
    val x = Array.tabulate(embDim)(d => toks.map(t => ew(t * embDim + d).toDouble))
    val conv = convRef(x, cw, cb, ch, embDim, k).map(_.map(math.max(0.0, _)))
    // the engine rounds each conv output to f32 before pooling — mirror
    // that boundary, then average in f64
    val ap = conv.map(_.map(_.toFloat.toDouble)
      .grouped(2).filter(_.length == 2).map(w => (w(0) + w(1)) / 2).toArray)
    val expected = mm(ap.map(_.max), w0, b0, 2, ch)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 2)
      assert(math.abs(got(j) - expected(j)) < 1e-5, s"logit $j: ${got(j)} vs ${expected(j)}")
  }

  test("conv on an un-transposed embedding and nonzero padding fail loudly at load") {
    val ew = vals(8, 71); val cw = vals(8, 72); val cb = vals(2, 73)
    def cnn(convMod: Module, body: String) = Module("__torch__.BadCNN", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(4, 2), ew), "training" -> B(false))),
      "conv" -> convMod,
      "fc" -> linear(vals(4, 74), 2, 2, vals(2, 75)))) -> Map("code/__torch__.py" ->
      s"""class BadCNN(Module):
         |  training : bool
         |  def forward(self: __torch__.BadCNN,
         |    x: Tensor) -> Tensor:
         |    emb = self.emb
         |    conv = self.conv
         |$body
         |""".stripMargin)
    // conv directly on the (n, seq, emb) embedding output: transpose missing
    val (m1, c1) = cnn(conv1d(cw, 2, 2, 2, cb),
      "    return (conv).forward((emb).forward(x, ), )")
    val noT = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badcnn1", "badcnn1", m1, c1)))
    assert(noT.getMessage.contains("transpose(1, 2) missing"))
    // padding='same' with stride != 1 raises in torch itself -> loud at load
    val (m2, c2) = cnn(conv1d(cw, 2, 2, 2, cb, stride = 2, paddingStr = "same"),
      "    e0 = torch.transpose((emb).forward(x, ), 1, 2)\n    return (conv).forward(e0, )")
    val strided = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badcnn2", "badcnn2", m2, c2)))
    assert(strided.getMessage.contains("padding='same' requires stride=1"))
  }

  test("separable Conv1d: same-padded depthwise + pointwise trace; golden vs naive recompute") {
    // token ids -> Embedding(8, 3) -> transpose -> depthwise Conv1d(3,
    // k=3, groups=3, padding='same' form) -> ReLU -> pointwise
    // Conv1d(3->4, k=1) -> adaptive max pool -> Linear(4->2)
    val (vocab, emb, cls) = (8, 3, 2)
    val ew = vals(vocab * emb, 321)
    val dw = vals(3 * 1 * 3, 322); val db = vals(3, 323)
    val pw = vals(4 * 3 * 1, 324); val pb = vals(4, 325)
    val (wf, bf) = (vals(cls * 4, 326), vals(cls, 327))
    val model = Module("__torch__.SepCnn", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "dwc" -> conv1d(dw, 3, 3, 3, db, padding = 1, groups = 3),
      "pwc" -> conv1d(pw, 4, 3, 1, pb),
      "pool" -> Module(AdaptiveMaxPool1dCls, Seq(
        "output_size" -> I(1), "training" -> B(false))),
      "fc" -> linear(wf, cls, 4, bf)))
    val code = Map("code/__torch__.py" ->
      """class SepCnn(Module):
        |  training : bool
        |  def forward(self: __torch__.SepCnn,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = torch.transpose((emb).forward(x, ), 1, 2)
        |    dwc = self.dwc
        |    d = torch.relu((dwc).forward(e, ))
        |    pwc = self.pwc
        |    p = (pwc).forward(d, )
        |    pool = self.pool
        |    q = torch.squeeze((pool).forward(p, ), 2)
        |    fc = self.fc
        |    return (fc).forward(q, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("sepcnn", "sepcnn", model, code))
    val convs = m.ops.collect { case c: Conv1dOp => c }
    assert(convs.length == 2)
    assert(convs(0).groups == 3 && convs(0).pad == 1 && convs(0).k == 3)
    assert(convs(1).groups == 1 && convs(1).k == 1)
    // naive recompute with the executor's f32 accumulation: depthwise
    // channel c reads ONLY channel c (zero-padded), pointwise mixes
    val toks = Array(3, 0, 6, 2, 5, 1)
    val L = toks.length
    val x = Array.tabulate(emb, L)((c, p) => ew(toks(p) * emb + c)) // (ch, L)
    val dOut = Array.tabulate(3, L) { (c, q) =>
      var acc = db(c)
      for (j <- 0 until 3) {
        val xi = q - 1 + j
        if (xi >= 0 && xi < L) acc += dw(c * 3 + j) * x(c)(xi)
      }
      math.max(0f, acc)
    }
    val pOut = Array.tabulate(4, L) { (c, q) =>
      var acc = pb(c)
      for (d <- 0 until 3) acc += pw(c * 3 + d) * dOut(d)(q)
      acc
    }
    val pooled = Array.tabulate(4)(c => pOut(c).max)
    val expected = mm(pooled.map(_.toDouble), wf, bf, cls, 4)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
  }

  test("dilated Conv1d: 'same' trace (pad = dilation*(k-1)/2), golden vs f64; valid-mode length check") {
    // TCN-style block: Embedding(8, 3) -> transpose -> Conv1d(3->4,
    // k=3, dilation=2, padding='same') -> ReLU -> global max pool ->
    // Linear(4->2). Taps read positions {q-2, q, q+2}; out-of-range
    // taps are exact zeros.
    val (vocab, emb, ch, k, cls) = (8, 3, 4, 3, 2)
    val ew = vals(vocab * emb, 341)
    val cw = vals(ch * emb * k, 342); val cb = vals(ch, 343)
    val (wf, bf) = (vals(cls * ch, 344), vals(cls, 345))
    def mk(name: String, conv: Module) = {
      val model = Module("__torch__.Tcn", Seq(
        "training" -> B(false),
        "emb" -> Module(EmbeddingCls, Seq(
          "weight" -> Tensor(Seq(vocab, emb), ew),
          "padding_idx" -> NoneV,
          "training" -> B(false))),
        "conv" -> conv,
        "pool" -> Module(AdaptiveMaxPool1dCls, Seq(
          "output_size" -> I(1), "training" -> B(false))),
        "fc" -> linear(wf, cls, ch, bf)))
      val code = Map("code/__torch__.py" ->
        """class Tcn(Module):
          |  training : bool
          |  def forward(self: __torch__.Tcn,
          |    x: Tensor) -> Tensor:
          |    emb = self.emb
          |    e0 = torch.transpose((emb).forward(x, ), 1, 2)
          |    conv = self.conv
          |    c = torch.relu((conv).forward(e0, ))
          |    pool = self.pool
          |    q = torch.squeeze((pool).forward(c, ), 2)
          |    fc = self.fc
          |    return (fc).forward(q, )
          |""".stripMargin)
      TorchScriptModel.load(writeTemp(name, name, model, code))
    }
    val m = mk("tcn", conv1d(cw, ch, emb, k, cb, dilation = 2, paddingStr = "same"))
    val cv = m.ops.collectFirst { case c: Conv1dOp => c }.get
    assert(cv.dilation == 2 && cv.pad == 2 && cv.stride == 1, s"traced $cv")
    // f64 recompute with dilated taps and zero padding
    def ref(toks: Array[Int]): Array[Double] = {
      val L = toks.length
      val pooled = Array.tabulate(ch) { c =>
        var mx = Double.NegativeInfinity
        for (q <- 0 until L) {
          var acc = cb(c).toDouble
          for (d <- 0 until emb; j <- 0 until k) {
            val xi = q + (j - 1) * 2
            if (xi >= 0 && xi < L)
              acc += cw((c * emb + d) * k + j) * ew(toks(xi) * emb + d)
          }
          mx = math.max(mx, math.max(0.0, acc))
        }
        mx
      }
      mm(pooled, wf, bf, cls, ch)
    }
    for (toks <- Seq(Array(3, 0, 6, 2, 5, 1), Array(7), Array(2, 4))) {
      val got = m.forwardTokens(toks)
      val expected = ref(toks)
      for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
        s"L=${toks.length} logit $j: ${got(j)} vs ${expected(j)}")
    }
    // valid mode: effective span = dilation*(k-1)+1 = 5 gates the length
    val mv = mk("tcnv", conv1d(cw, ch, emb, k, cb, dilation = 2))
    val cvv = mv.ops.collectFirst { case c: Conv1dOp => c }.get
    assert(cvv.dilation == 2 && cvv.pad == 0)
    val short = intercept[IllegalArgumentException](mv.forwardTokens(Array(1, 2, 3, 4)))
    assert(short.getMessage.contains("need >= 5 tokens"))
    val got5 = mv.forwardTokens(Array(3, 0, 6, 2, 5))
    // valid-mode L=5 output: single position q=0 reading taps {0, 2, 4}
    val pooled5 = Array.tabulate(ch) { c =>
      var acc = cb(c).toDouble
      for (d <- 0 until emb; j <- 0 until k)
        acc += cw((c * emb + d) * k + j) * ew(Array(3, 0, 6, 2, 5)(j * 2) * emb + d)
      math.max(0.0, acc)
    }
    val exp5 = mm(pooled5, wf, bf, cls, ch)
    for (j <- 0 until cls) assert(math.abs(got5(j) - exp5(j)) < 1e-5)
  }

  test("causal TCN: ConstantPad1d left pad == symmetric pad + Chomp1d; golden vs f64 causal reference") {
    // Embedding(8, 3) -> transpose -> CAUSAL dilated conv (k=3,
    // dilation=2: position q reads tokens {q-4, q-2, q}) -> ReLU ->
    // global max pool -> Linear(3->2), stated both ways torch code
    // states it: nn.ConstantPad1d((4, 0)) + valid conv, and
    // symmetric padding=4 + x[:, :, :-4] (the locuslab Chomp1d).
    val (vocab, emb, ch, k, cls) = (8, 3, 4, 3, 2)
    val ew = vals(vocab * emb, 361)
    val cw = vals(ch * emb * k, 362); val cb = vals(ch, 363)
    val (wf, bf) = (vals(cls * ch, 364), vals(cls, 365))
    def mk(name: String, pre: Seq[(String, Module)], conv: Module, body: String) = {
      val model = Module("__torch__.CTcn", Seq(
        "training" -> B(false),
        "emb" -> Module(EmbeddingCls, Seq(
          "weight" -> Tensor(Seq(vocab, emb), ew),
          "padding_idx" -> NoneV,
          "training" -> B(false)))) ++ pre ++ Seq(
        "conv" -> conv,
        "pool" -> Module(AdaptiveMaxPool1dCls, Seq(
          "output_size" -> I(1), "training" -> B(false))),
        "fc" -> linear(wf, cls, ch, bf)))
      val code = Map("code/__torch__.py" ->
        s"""class CTcn(Module):
           |  training : bool
           |  def forward(self: __torch__.CTcn,
           |    x: Tensor) -> Tensor:
           |    emb = self.emb
           |    e0 = torch.transpose((emb).forward(x, ), 1, 2)
           |$body
           |    pool = self.pool
           |    q = torch.squeeze((pool).forward(r, ), 2)
           |    fc = self.fc
           |    return (fc).forward(q, )
           |""".stripMargin)
      TorchScriptModel.load(writeTemp(name, name, model, code))
    }
    val mPad = mk("ctcnp", Seq("pad" -> constantPad1d(4, 0)),
      conv1d(cw, ch, emb, k, cb, dilation = 2),
      """    pad = self.pad
        |    p0 = (pad).forward(e0, )
        |    conv = self.conv
        |    r = torch.relu((conv).forward(p0, ))""".stripMargin)
    assert(mPad.ops.contains(Pad1dOp(4, 0)), mPad.ops.toString)
    val mChomp = mk("ctcnc", Seq.empty,
      conv1d(cw, ch, emb, k, cb, dilation = 2, padding = 4),
      """    conv = self.conv
        |    c0 = (conv).forward(e0, )
        |    c1 = torch.slice(c0, 2, 0, -4, 1)
        |    r = torch.relu(c1)""".stripMargin)
    assert(mChomp.ops.contains(Chomp1dOp(4)), mChomp.ops.toString)
    // f64 causal reference
    def ref(toks: Array[Int]): Array[Double] = {
      val L = toks.length
      val pooled = Array.tabulate(ch) { c =>
        var mx = Double.NegativeInfinity
        for (q <- 0 until L) {
          var acc = cb(c).toDouble
          for (d <- 0 until emb; j <- 0 until k) {
            val xi = q + (j - 2) * 2 // taps q-4, q-2, q
            if (xi >= 0 && xi < L)
              acc += cw((c * emb + d) * k + j) * ew(toks(xi) * emb + d)
          }
          mx = math.max(mx, math.max(0.0, acc))
        }
        mx
      }
      mm(pooled, wf, bf, cls, ch)
    }
    for (toks <- Seq(Array(3, 0, 6, 2, 5, 1, 7), Array(4), Array(2, 4, 1))) {
      val a = mPad.forwardTokens(toks)
      val b = mChomp.forwardTokens(toks)
      assert(a.toSeq == b.toSeq, s"L=${toks.length}: pad form $a != chomp form $b")
      val expected = ref(toks)
      for (j <- 0 until cls) assert(math.abs(a(j) - expected(j)) < 1e-5,
        s"L=${toks.length} logit $j: ${a(j)} vs ${expected(j)}")
    }
    // nonzero pad value fails loudly at load
    val badPad = intercept[RuntimeException](mk("ctcnbad",
      Seq("pad" -> constantPad1d(4, 0, value = 0.5)),
      conv1d(cw, ch, emb, k, cb, dilation = 2),
      """    pad = self.pad
        |    p0 = (pad).forward(e0, )
        |    conv = self.conv
        |    r = torch.relu((conv).forward(p0, ))""".stripMargin))
    assert(badPad.getMessage.contains("nonzero pad value"), badPad.getMessage)
    // chomping the whole sequence fails loudly at run
    val mShort = new TorchScriptModel(IndexedSeq(
      EmbeddingSeqOp(ew, vocab, emb), TransposeOp, Chomp1dOp(10),
      SeqMaxPoolOp, LinearLayer(vals(2 * emb, 366), vals(2, 367), 2, emb)))
    val gone = intercept[IllegalArgumentException](mShort.forwardTokens(Array(1, 2)))
    assert(gone.getMessage.contains("nothing left"), gone.getMessage)
  }

  // ---- independent f64 recurrences (gate order r,z,n / i,f,g,o) ----
  private def gruRef(toks: Array[Int], ew: Array[Float], emb: Int,
      wIh: Array[Float], wHh: Array[Float], bIh: Array[Float], bHh: Array[Float],
      H: Int): Array[Double] = {
    val h = new Array[Double](H)
    for (t <- toks) {
      val x = Array.tabulate(emb)(j => ew(t * emb + j).toDouble)
      def ih(g: Int, o: Int) = bIh(g * H + o) +
        (0 until emb).map(j => wIh((g * H + o) * emb + j).toDouble * x(j)).sum
      def hh(g: Int, o: Int) = bHh(g * H + o) +
        (0 until H).map(j => wHh((g * H + o) * H + j).toDouble * h(j)).sum
      val hNew = Array.tabulate(H) { o =>
        val r = 1.0 / (1.0 + math.exp(-(ih(0, o) + hh(0, o))))
        val z = 1.0 / (1.0 + math.exp(-(ih(1, o) + hh(1, o))))
        val n = math.tanh(ih(2, o) + r * hh(2, o))
        (1.0 - z) * n + z * h(o)
      }
      System.arraycopy(hNew, 0, h, 0, H)
    }
    h
  }
  private def lstmRef(toks: Array[Int], ew: Array[Float], emb: Int,
      wIh: Array[Float], wHh: Array[Float], bIh: Array[Float], bHh: Array[Float],
      H: Int): Array[Double] = {
    val h = new Array[Double](H)
    val c = new Array[Double](H)
    for (t <- toks) {
      val x = Array.tabulate(emb)(j => ew(t * emb + j).toDouble)
      def gate(g: Int, o: Int) = bIh(g * H + o) + bHh(g * H + o) +
        (0 until emb).map(j => wIh((g * H + o) * emb + j).toDouble * x(j)).sum +
        (0 until H).map(j => wHh((g * H + o) * H + j).toDouble * h(j)).sum
      val cNew = new Array[Double](H)
      val hNew = new Array[Double](H)
      for (o <- 0 until H) {
        val i = 1.0 / (1.0 + math.exp(-gate(0, o)))
        val f = 1.0 / (1.0 + math.exp(-gate(1, o)))
        val g = math.tanh(gate(2, o))
        val og = 1.0 / (1.0 + math.exp(-gate(3, o)))
        cNew(o) = f * c(o) + i * g
        hNew(o) = og * math.tanh(cNew(o))
      }
      System.arraycopy(cNew, 0, c, 0, H)
      System.arraycopy(hNew, 0, h, 0, H)
    }
    h
  }

  test("GRU archive: tuple-unpack forward traces to RnnOp, golden vs f64 recurrence") {
    // token ids -> Embedding(8, 3) -> GRU(3, 4) -> h_n.squeeze(0) -> Linear(4->3)
    val (vocab, emb, h, cls) = (8, 3, 4, 3)
    val ew = vals(vocab * emb, 61)
    val wIh = vals(3 * h * emb, 62); val wHh = vals(3 * h * h, 63)
    val bIh = vals(3 * h, 64); val bHh = vals(3 * h, 65)
    val (wf, bf) = (vals(cls * h, 66), vals(cls, 67))
    val model = Module("__torch__.GruNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "gru" -> rnn(GruCls, wIh, wHh, bIh, bHh, emb, h),
      "fc" -> linear(wf, cls, h, bf)))
    val code = Map("code/__torch__.py" ->
      """class GruNet(Module):
        |  training : bool
        |  def forward(self: __torch__.GruNet,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    gru = self.gru
        |    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    h = torch.squeeze(hn, 0)
        |    fc = self.fc
        |    return (fc).forward(h, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("gru", "gru", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "RnnOp", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val op = m.ops(1).asInstanceOf[RnnOp]
    assert(op.kind == "gru" && op.hidden == h && op.inDim == emb && op.gates == 3)
    assert(op.wIh.toSeq == wIh.toSeq && op.wHh.toSeq == wHh.toSeq)
    val toks = Array(3, 0, 6, 2, 5, 1)
    val expected = mm(gruRef(toks, ew, emb, wIh, wHh, bIh, bHh, h), wf, bf, cls, h)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // batch path agrees with the single-row path bit-for-bit
    val batch = m.forwardTokensBatch(Array(toks, Array(1), Array(7, 7)))
    for (j <- 0 until cls) assert(batch(j) == got(j))
    // single-token row: one recurrence step from h_0 = 0
    val one = m.forwardTokens(Array(2))
    val expOne = mm(gruRef(Array(2), ew, emb, wIh, wHh, bIh, bHh, h), wf, bf, cls, h)
    for (j <- 0 until cls) assert(math.abs(one(j) - expOne(j)) < 1e-5)
  }

  test("stacked GRU archive: num_layers=2 + h_n[-1] traces; layer 2 reads layer 1's sequence") {
    val (vocab, emb, h, cls) = (8, 3, 4, 3)
    val ew = vals(vocab * emb, 161)
    val wIh = vals(3 * h * emb, 162); val wHh = vals(3 * h * h, 163)
    val bIh = vals(3 * h, 164); val bHh = vals(3 * h, 165)
    val wIh2 = vals(3 * h * h, 166); val wHh2 = vals(3 * h * h, 167)
    val bIh2 = vals(3 * h, 168); val bHh2 = vals(3 * h, 169)
    val (wf, bf) = (vals(cls * h, 170), vals(cls, 171))
    val model = Module("__torch__.SgruNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "gru" -> rnn(GruCls, wIh, wHh, bIh, bHh, emb, h, numLayers = 2,
        extraLayers = Seq((wIh2, wHh2, bIh2, bHh2))),
      "fc" -> linear(wf, cls, h, bf)))
    val code = Map("code/__torch__.py" ->
      """class SgruNet(Module):
        |  training : bool
        |  def forward(self: __torch__.SgruNet,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    gru = self.gru
        |    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    h = torch.select(hn, 0, -1)
        |    fc = self.fc
        |    return (fc).forward(h, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("sgru", "sgru", model, code))
    val op = m.ops(1).asInstanceOf[RnnOp]
    assert(op.numLayers == 2 && op.stack.head.wIh.toSeq == wIh2.toSeq)
    // f64 reference: layer 2 consumes layer 1's NEW hidden per position
    val toks = Array(3, 0, 6, 2, 5, 1)
    val h1 = new Array[Double](h)
    val h2 = new Array[Double](h)
    def step(x: Array[Double], hPrev: Array[Double], wi: Array[Float],
        wh: Array[Float], bi: Array[Float], bh: Array[Float], in: Int) = {
      def ih(g: Int, o: Int) = bi(g * h + o) +
        (0 until in).map(j => wi((g * h + o) * in + j).toDouble * x(j)).sum
      def hh(g: Int, o: Int) = bh(g * h + o) +
        (0 until h).map(j => wh((g * h + o) * h + j).toDouble * hPrev(j)).sum
      Array.tabulate(h) { o =>
        val r = 1.0 / (1.0 + math.exp(-(ih(0, o) + hh(0, o))))
        val z = 1.0 / (1.0 + math.exp(-(ih(1, o) + hh(1, o))))
        val n = math.tanh(ih(2, o) + r * hh(2, o))
        (1.0 - z) * n + z * hPrev(o)
      }
    }
    for (t <- toks) {
      val x = Array.tabulate(emb)(j => ew(t * emb + j).toDouble)
      val n1 = step(x, h1, wIh, wHh, bIh, bHh, emb)
      val n2 = step(n1, h2, wIh2, wHh2, bIh2, bHh2, h)
      System.arraycopy(n1, 0, h1, 0, h)
      System.arraycopy(n2, 0, h2, 0, h)
    }
    val expected = mm(h2, wf, bf, cls, h)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // a single-layer recompute (fc over layer-1's final h) must differ —
    // depth is live, not cosmetic
    val single = mm(h1, wf, bf, cls, h)
    assert((0 until cls).exists(j => math.abs(single(j) - expected(j)) > 1e-6))
  }

  test("bidirectional GRU archive: cat(h_n[-2], h_n[-1]) traces; golden vs f64 fwd+rev") {
    val (vocab, emb, h, cls) = (8, 3, 4, 3)
    val ew = vals(vocab * emb, 261)
    val wIh = vals(3 * h * emb, 262); val wHh = vals(3 * h * h, 263)
    val bIh = vals(3 * h, 264); val bHh = vals(3 * h, 265)
    val wIhR = vals(3 * h * emb, 266); val wHhR = vals(3 * h * h, 267)
    val bIhR = vals(3 * h, 268); val bHhR = vals(3 * h, 269)
    val (wf, bf) = (vals(cls * 2 * h, 270), vals(cls, 271))
    def net(body: String) = (
      Module("__torch__.BgruNet", Seq(
        "training" -> B(false),
        "emb" -> Module(EmbeddingCls, Seq(
          "weight" -> Tensor(Seq(vocab, emb), ew),
          "padding_idx" -> NoneV,
          "training" -> B(false))),
        "gru" -> rnn(GruCls, wIh, wHh, bIh, bHh, emb, h,
          reverseLayers = Seq((wIhR, wHhR, bIhR, bHhR))),
        "fc" -> linear(wf, cls, 2 * h, bf))),
      Map("code/__torch__.py" ->
        s"""class BgruNet(Module):
           |  training : bool
           |  def forward(self: __torch__.BgruNet,
           |    x: Tensor) -> Tensor:
           |    emb = self.emb
           |    e = (emb).forward(x, )
           |    gru = self.gru
           |    _0 = (gru).forward(e, None, )
           |    out, hn, = _0
           |$body
           |    fc = self.fc
           |    return (fc).forward(h, )
           |""".stripMargin))
    val (model, code) = net(
      """    hf = torch.select(hn, 0, -2)
        |    hb = torch.select(hn, 0, -1)
        |    h = torch.cat([hf, hb], 1)""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("bgru", "bgru", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "RnnOp", "LinearLayer"))
    val op = m.ops(1).asInstanceOf[RnnOp]
    assert(op.bidi && op.outWidth == 2 * h && op.rev.head.wIh.toSeq == wIhR.toSeq)
    val toks = Array(3, 0, 6, 2, 5, 1)
    val hFwd = gruRef(toks, ew, emb, wIh, wHh, bIh, bHh, h)
    val hBwd = gruRef(toks.reverse, ew, emb, wIhR, wHhR, bIhR, bHhR, h)
    val expected = mm(hFwd ++ hBwd, wf, bf, cls, 2 * h)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // directions are live: swapping reverse weights changes the output
    assert((0 until cls).exists { j =>
      val swapped = mm(hBwd ++ hFwd, wf, bf, cls, 2 * h)
      math.abs(swapped(j) - expected(j)) > 1e-6
    })
    // misuse fails loudly at LOAD time
    val (m1, c1) = net("    h = torch.squeeze(hn, 0)")
    val sq = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("bgru1", "bgru1", m1, c1)))
    assert(sq.getMessage.contains("no-op"))
    val (m2, c2) = net(
      """    hf = torch.select(hn, 0, -2)
        |    hb = torch.select(hn, 0, -1)
        |    h = torch.cat([hb, hf], 1)""".stripMargin)
    val rev = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("bgru2", "bgru2", m2, c2)))
    assert(rev.getMessage.contains("h_n[-2], h_n[-1]"))
    val (m3, c3) = net("    h = torch.select(hn, 0, 0)")
    val sel = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("bgru3", "bgru3", m3, c3)))
    assert(sel.getMessage.contains("bidirectional"))
  }

  test("GRU out.mean(1) traces to the seqPool read-out; golden vs f64 position mean") {
    val (vocab, emb, h, cls) = (8, 3, 4, 3)
    val ew = vals(vocab * emb, 281)
    val wIh = vals(3 * h * emb, 282); val wHh = vals(3 * h * h, 283)
    val bIh = vals(3 * h, 284); val bHh = vals(3 * h, 285)
    val (wf, bf) = (vals(cls * h, 286), vals(cls, 287))
    val model = Module("__torch__.MgruNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "gru" -> rnn(GruCls, wIh, wHh, bIh, bHh, emb, h),
      "fc" -> linear(wf, cls, h, bf)))
    val code = Map("code/__torch__.py" ->
      """class MgruNet(Module):
        |  training : bool
        |  def forward(self: __torch__.MgruNet,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    gru = self.gru
        |    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    p = torch.mean(out, [1], False, None)
        |    fc = self.fc
        |    return (fc).forward(p, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("mgru", "mgru", model, code))
    val op = m.ops.collectFirst { case r: RnnOp => r }.get
    assert(op.seqPool.contains("mean") && !op.bidi)
    // f64 reference: mean over the hidden AFTER each position
    val toks = Array(3, 0, 6, 2, 5, 1)
    val acc = new Array[Double](h)
    val hCur = new Array[Double](h)
    for (t <- toks) {
      val x = Array.tabulate(emb)(j => ew(t * emb + j).toDouble)
      def ih(g: Int, o: Int) = bIh(g * h + o) +
        (0 until emb).map(j => wIh((g * h + o) * emb + j).toDouble * x(j)).sum
      def hh(g: Int, o: Int) = bHh(g * h + o) +
        (0 until h).map(j => wHh((g * h + o) * h + j).toDouble * hCur(j)).sum
      val hNew = Array.tabulate(h) { o =>
        val r = 1.0 / (1.0 + math.exp(-(ih(0, o) + hh(0, o))))
        val z = 1.0 / (1.0 + math.exp(-(ih(1, o) + hh(1, o))))
        val n = math.tanh(ih(2, o) + r * hh(2, o))
        (1.0 - z) * n + z * hCur(o)
      }
      System.arraycopy(hNew, 0, hCur, 0, h)
      for (o <- 0 until h) acc(o) += hNew(o)
    }
    val pooled = acc.map(_ / toks.length)
    val expected = mm(pooled, wf, bf, cls, h)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // the pool is live: the final-hidden read-out differs
    val hnOnly = mm(hCur, wf, bf, cls, h)
    assert((0 until cls).exists(j => math.abs(hnOnly(j) - expected(j)) > 1e-6))
  }

  test("MultiheadAttention archive: packed in_proj splits per-head; golden vs f64 dense MHA") {
    // token ids -> Embedding(8, 4) -> nn.MultiheadAttention(4, 2,
    // batch_first) self-attention -> out.mean(1) -> Linear(4->3)
    val (vocab, emb, heads, cls) = (8, 4, 2, 3)
    val ew = vals(vocab * emb, 301)
    val inW = vals(3 * emb * emb, 302); val inB = vals(3 * emb, 303)
    val outW = vals(emb * emb, 304); val outB = vals(emb, 305)
    val (wf, bf) = (vals(cls * emb, 306), vals(cls, 307))
    def net(body: String) = (
      Module("__torch__.MhaNet", Seq(
        "training" -> B(false),
        "emb" -> Module(EmbeddingCls, Seq(
          "weight" -> Tensor(Seq(vocab, emb), ew),
          "padding_idx" -> NoneV,
          "training" -> B(false))),
        "attn" -> mha(inW, inB, outW, outB, emb, heads),
        "fc" -> linear(wf, cls, emb, bf))),
      Map("code/__torch__.py" ->
        s"""class MhaNet(Module):
           |  training : bool
           |  def forward(self: __torch__.MhaNet,
           |    x: Tensor) -> Tensor:
           |    emb = self.emb
           |    e = (emb).forward(x, )
           |    attn = self.attn
           |$body
           |    p = torch.mean(a, [1], False, None)
           |    fc = self.fc
           |    return (fc).forward(p, )
           |""".stripMargin))
    val (model, code) = net(
      """    _0 = (attn).forward(e, e, e, None, True, None, )
        |    a, _1, = _0""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("mhan", "mhan", model, code))
    val ea = m.ops.collectFirst { case a: EncoderAttnOp => a }.get
    assert(ea.heads.length == heads && ea.proj.isDefined && !ea.residual)
    assert(ea.heads.forall(h => h.dim == emb / heads && h.inDim == emb))
    // f64 dense reference straight from the PACKED layout: full (E, E)
    // projections, reshape to heads, per-head softmax attention,
    // concat, out_proj, mean, fc — an independent statement of the
    // split the tracer performs
    val toks = Array(3, 0, 6, 2, 5, 1)
    val L = toks.length
    val x = Array.tabulate(L, emb)((p, j) => ew(toks(p) * emb + j).toDouble)
    def proj(off: Int): Array[Array[Double]] = Array.tabulate(L, emb)((p, o) =>
      inB(off * emb + o) + (0 until emb).map(j => x(p)(j) * inW((off * emb + o) * emb + j)).sum)
    val (qm, km, vm) = (proj(0), proj(1), proj(2))
    val hd = emb / heads
    val attn = Array.tabulate(L, emb) { (p, o) => 0.0 } // filled below
    for (h <- 0 until heads) {
      val scale = 1.0 / math.sqrt(hd.toDouble)
      for (p <- 0 until L) {
        val sc = Array.tabulate(L)(b0 =>
          (0 until hd).map(j => qm(p)(h * hd + j) * km(b0)(h * hd + j)).sum * scale)
        val mx = sc.max
        val es = sc.map(s0 => math.exp(s0 - mx))
        val z = es.sum
        for (j <- 0 until hd)
          attn(p)(h * hd + j) = (0 until L).map(b0 => es(b0) * vm(b0)(h * hd + j)).sum / z
      }
    }
    val pooled = new Array[Double](emb)
    for (p <- 0 until L) {
      val o = Array.tabulate(emb)(oi =>
        outB(oi) + (0 until emb).map(j => attn(p)(j) * outW(oi * emb + j)).sum)
      for (j <- 0 until emb) pooled(j) += o(j) / L
    }
    val expected = mm(pooled, wf, bf, cls, emb)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // programmatic Mha.split produces the identical op
    val split = Mha.split(inW, inB, emb, heads)
    assert(split.zip(ea.heads).forall { case (a, b) =>
      a.wq.toSeq == b.wq.toSeq && a.wk.toSeq == b.wk.toSeq &&
        a.wv.toSeq == b.wv.toSeq && a.scale == b.scale })
    // misuse fails loudly: a non-bool, non-None extra arg (a mask)
    val (m2, c2) = net(
      """    _0 = (attn).forward(e, e, e, 1, )
        |    a, _1, = _0""".stripMargin)
    val bad = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("mhan2", "mhan2", m2, c2)))
    assert(bad.getMessage.contains("unsupported"))
  }

  test("MultiheadAttention separate q/k/v weights (_qkv_same_embed_dim=False): trace == packed; kdim mismatch loud") {
    // the SAME weights as the packed test, stored as three (E, E)
    // projection tensors — torch's kdim/vdim-explicit layout. The
    // traced heads and the forward logits must be IDENTICAL to the
    // packed form (torch's use_separate_proj_weight path computes the
    // same projections when kdim == vdim == embed).
    val (vocab, emb, heads, cls) = (8, 4, 2, 3)
    val ew = vals(vocab * emb, 301)
    val inW = vals(3 * emb * emb, 302); val inB = vals(3 * emb, 303)
    val outW = vals(emb * emb, 304); val outB = vals(emb, 305)
    val (wf, bf) = (vals(cls * emb, 306), vals(cls, 307))
    val qW = java.util.Arrays.copyOfRange(inW, 0, emb * emb)
    val kW = java.util.Arrays.copyOfRange(inW, emb * emb, 2 * emb * emb)
    val vW = java.util.Arrays.copyOfRange(inW, 2 * emb * emb, 3 * emb * emb)
    def net(attn: Module) = (
      Module("__torch__.MhaSep", Seq(
        "training" -> B(false),
        "emb" -> Module(EmbeddingCls, Seq(
          "weight" -> Tensor(Seq(vocab, emb), ew),
          "padding_idx" -> NoneV,
          "training" -> B(false))),
        "attn" -> attn,
        "fc" -> linear(wf, cls, emb, bf))),
      Map("code/__torch__.py" ->
        """class MhaSep(Module):
          |  training : bool
          |  def forward(self: __torch__.MhaSep,
          |    x: Tensor) -> Tensor:
          |    emb = self.emb
          |    e = (emb).forward(x, )
          |    attn = self.attn
          |    _0 = (attn).forward(e, e, e, None, True, None, )
          |    a, _1, = _0
          |    p = torch.mean(a, [1], False, None)
          |    fc = self.fc
          |    return (fc).forward(p, )
          |""".stripMargin))
    val (model, code) = net(mhaSeparate(qW, kW, vW, inB, outW, outB, emb, heads))
    val m = TorchScriptModel.load(writeTemp("mhasep", "mhasep", model, code))
    val ea = m.ops.collectFirst { case a: EncoderAttnOp => a }.get
    // heads identical to the packed split
    val packed = Mha.split(inW, inB, emb, heads)
    assert(ea.heads.length == heads)
    assert(packed.zip(ea.heads).forall { case (a, b) =>
      a.wq.toSeq == b.wq.toSeq && a.bq.toSeq == b.bq.toSeq &&
        a.wk.toSeq == b.wk.toSeq && a.wv.toSeq == b.wv.toSeq &&
        a.bv.toSeq == b.bv.toSeq && a.scale == b.scale })
    // forward logits identical to the packed archive (same weights)
    val (pModel, pCode) = net(mha(inW, inB, outW, outB, emb, heads))
    val mp = TorchScriptModel.load(writeTemp("mhasep0", "mhasep0", pModel, pCode))
    val toks = Array(3, 0, 6, 2, 5, 1)
    assert(m.forwardTokens(toks).toSeq == mp.forwardTokens(toks).toSeq)
    // kdim != embed cannot serve self-attention: the (E, kdim) weight
    // fails the size check loudly at load
    val (mBad, cBad) = net(mhaSeparate(qW,
      vals(emb * (emb + 2), 308), vW, inB, outW, outB, emb, heads, kdim = emb + 2))
    val bad = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("mhasepbad", "mhasepbad", mBad, cBad)))
    assert(bad.getMessage.contains("k_proj_weight"), bad.getMessage)
  }

  test("attention-pooling read-out: latent-query MHA traces to AttnPoolOp; golden vs f64 dense reference") {
    // token ids -> Embedding(8, 4) -> MHA(latent(2, 4), x, x) with 2
    // heads (the Set-Transformer PMA / CoCa pooler: learned queries
    // attend over the sequence) -> flatten (n, 8) -> Linear(8 -> 3)
    val (vocab, emb, heads, mLat, cls) = (8, 4, 2, 2, 3)
    val ew = vals(vocab * emb, 311)
    val lat = vals(mLat * emb, 312)
    val inW = vals(3 * emb * emb, 313); val inB = vals(3 * emb, 314)
    val outW = vals(emb * emb, 315); val outB = vals(emb, 316)
    val (wf, bf) = (vals(cls * mLat * emb, 317), vals(cls, 318))
    val model = Module("__torch__.AttnPool", Seq(
      "training" -> B(false),
      "latent" -> Tensor(Seq(mLat, emb), lat),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "attn" -> mha(inW, inB, outW, outB, emb, heads),
      "fc" -> linear(wf, cls, mLat * emb, bf)))
    val code = Map("code/__torch__.py" ->
      """class AttnPool(Module):
        |  training : bool
        |  def forward(self: __torch__.AttnPool,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    lat = self.latent
        |    b = torch.size(e, 0)
        |    q0 = torch.unsqueeze(lat, 0)
        |    q = torch.expand(q0, [b, -1, -1])
        |    attn = self.attn
        |    _0 = (attn).forward(q, e, e, None, True, None, )
        |    a, _1, = _0
        |    p = torch.flatten(a, 1)
        |    fc = self.fc
        |    return (fc).forward(p, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("attnpool", "attnpool", model, code))
    val ap = m.ops.collectFirst { case a: AttnPoolOp => a }.get
    assert(ap.m == mLat && ap.heads.length == heads && ap.proj.isDefined)
    assert(m.outDim == cls)
    // f64 dense reference straight from the packed layout
    val toks = Array(3, 0, 6, 2, 5, 1)
    val L = toks.length
    val x = Array.tabulate(L, emb)((p, j) => ew(toks(p) * emb + j).toDouble)
    def proj(off: Int, rows: Array[Array[Double]]): Array[Array[Double]] =
      Array.tabulate(rows.length, emb)((p, o) =>
        inB(off * emb + o) +
          (0 until emb).map(j => rows(p)(j) * inW((off * emb + o) * emb + j)).sum)
    val latRows = Array.tabulate(mLat, emb)((i, j) => lat(i * emb + j).toDouble)
    val (qm, km, vm) = (proj(0, latRows), proj(1, x), proj(2, x))
    val hd = emb / heads
    val pooled = Array.tabulate(mLat, emb)((_, _) => 0.0)
    for (h <- 0 until heads; i <- 0 until mLat) {
      val scale = 1.0 / math.sqrt(hd.toDouble)
      val sc = Array.tabulate(L)(p =>
        (0 until hd).map(j => qm(i)(h * hd + j) * km(p)(h * hd + j)).sum * scale)
      val mx = sc.max
      val es = sc.map(s0 => math.exp(s0 - mx))
      val z = es.sum
      for (j <- 0 until hd)
        pooled(i)(h * hd + j) = (0 until L).map(p => es(p) * vm(p)(h * hd + j)).sum / z
    }
    val projed = Array.tabulate(mLat, emb)((i, o) =>
      outB(o) + (0 until emb).map(j => pooled(i)(j) * outW(o * emb + j)).sum)
    val flat = Array.tabulate(mLat * emb)(i => projed(i / emb)(i % emb))
    val expected = mm(flat, wf, bf, cls, mLat * emb)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // batch: rows pool independently; a 1-token row is legal
    val toks2 = Array(7)
    val batch = m.forwardTokensBatch(Array(toks, toks2))
    for (j <- 0 until cls) assert(math.abs(batch(j) - expected(j)) < 1e-5)
    // misuse fails loudly: latent as VALUE instead of query
    val badCode = Map("code/__torch__.py" ->
      """class AttnPool(Module):
        |  training : bool
        |  def forward(self: __torch__.AttnPool,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    lat = self.latent
        |    b = torch.size(e, 0)
        |    q0 = torch.unsqueeze(lat, 0)
        |    q = torch.expand(q0, [b, -1, -1])
        |    attn = self.attn
        |    _0 = (attn).forward(e, e, q, None, True, None, )
        |    a, _1, = _0
        |    p = torch.flatten(a, 1)
        |    fc = self.fc
        |    return (fc).forward(p, )
        |""".stripMargin)
    val bad = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("attnpoolbad", "attnpoolbad", model, badCode)))
    assert(bad.getMessage.contains("distinct query/key/value"), bad.getMessage)
  }

  test("LSTM archive: nested tuple unpack + select(0, -1), golden vs f64 recurrence") {
    val (vocab, emb, h, cls) = (6, 2, 3, 2)
    val ew = vals(vocab * emb, 71)
    val wIh = vals(4 * h * emb, 72); val wHh = vals(4 * h * h, 73)
    val bIh = vals(4 * h, 74); val bHh = vals(4 * h, 75)
    val (wf, bf) = (vals(cls * h, 76), vals(cls, 77))
    val model = Module("__torch__.LstmNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "lstm" -> rnn(LstmCls, wIh, wHh, bIh, bHh, emb, h),
      "fc" -> linear(wf, cls, h, bf)))
    val code = Map("code/__torch__.py" ->
      """class LstmNet(Module):
        |  training : bool
        |  def forward(self: __torch__.LstmNet,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    lstm = self.lstm
        |    _0 = (lstm).forward(e, None, )
        |    out, _1, = _0
        |    hn, cn, = _1
        |    h = torch.select(hn, 0, -1)
        |    fc = self.fc
        |    return (fc).forward(h, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("lstm", "lstm", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "RnnOp", "LinearLayer"))
    val op = m.ops(1).asInstanceOf[RnnOp]
    assert(op.kind == "lstm" && op.gates == 4)
    val toks = Array(4, 1, 5, 0, 3)
    val expected = mm(lstmRef(toks, ew, emb, wIh, wHh, bIh, bHh, h), wf, bf, cls, h)
    val got = m.forwardTokens(toks)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
  }

  test("transformer encoder block: 2-head cat + out-proj + residuals + seq LayerNorm + FFN") {
    // token ids -> Embedding(8, 4) -> [head1(4->2), head2(4->2)] cat ->
    // proj(4->4) -> +residual -> LayerNorm(4) -> FFN(4->8->4, relu) ->
    // +residual -> LayerNorm(4) -> mean(dim=1) -> Linear(4->3)
    val (vocab, d, hd) = (8, 4, 2)
    val ew = vals(vocab * d, 101)
    def head(seed: Int) = (vals(hd * d, seed), vals(hd, seed + 1))
    val (wq1, bq1) = head(102); val (wk1, bk1) = head(104); val (wv1, bv1) = head(106)
    val (wq2, bq2) = head(108); val (wk2, bk2) = head(110); val (wv2, bv2) = head(112)
    val (wp, bp) = (vals(d * d, 114), vals(d, 115))
    val (g1, be1) = (vals(d, 116).map(v => 1f + v * 0.1f), vals(d, 117))
    val (w1, b1) = (vals(8 * d, 118), vals(8, 119))
    val (w2, b2) = (vals(d * 8, 120), vals(d, 121))
    val (g2, be2) = (vals(d, 122).map(v => 1f + v * 0.1f), vals(d, 123))
    val (wf, bf) = (vals(3 * d, 124), vals(3, 125))
    def ln(name: String, g: Array[Float], b: Array[Float]) = name -> Module(
      "__torch__.torch.nn.modules.normalization.LayerNorm", Seq(
        "weight" -> Tensor(Seq(d), g), "bias" -> Tensor(Seq(d), b),
        "eps" -> F(1e-5), "training" -> B(false)))
    val model = Module("__torch__.EncNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, d), ew),
        "padding_idx" -> NoneV, "training" -> B(false))),
      "q1" -> linear(wq1, hd, d, bq1), "k1" -> linear(wk1, hd, d, bk1),
      "v1" -> linear(wv1, hd, d, bv1),
      "q2" -> linear(wq2, hd, d, bq2), "k2" -> linear(wk2, hd, d, bk2),
      "v2" -> linear(wv2, hd, d, bv2),
      "proj" -> linear(wp, d, d, bp),
      ln("ln1", g1, be1),
      "lin1" -> linear(w1, 8, d, b1), "lin2" -> linear(w2, d, 8, b2),
      ln("ln2", g2, be2),
      "fc" -> linear(wf, 3, d, bf)))
    val code = Map("code/__torch__.py" ->
      """class EncNet(Module):
        |  training : bool
        |  def forward(self: __torch__.EncNet,
        |    x: Tensor) -> Tensor:
        |    emb = self.emb
        |    e = (emb).forward(x, )
        |    s1 = torch.div(torch.matmul((self.q1).forward(e, ), torch.transpose((self.k1).forward(e, ), -2, -1)), 1.4142135623730951)
        |    o1 = torch.matmul(torch.softmax(s1, -1), (self.v1).forward(e, ))
        |    s2 = torch.div(torch.matmul((self.q2).forward(e, ), torch.transpose((self.k2).forward(e, ), -2, -1)), 1.4142135623730951)
        |    o2 = torch.matmul(torch.softmax(s2, -1), (self.v2).forward(e, ))
        |    o = torch.cat([o1, o2], -1)
        |    p = (self.proj).forward(o, )
        |    r = torch.add(e, p)
        |    n1 = (self.ln1).forward(r, )
        |    f1 = torch.relu((self.lin1).forward(n1, ))
        |    f2 = (self.lin2).forward(f1, )
        |    r2 = torch.add(n1, f2)
        |    n2 = (self.ln2).forward(r2, )
        |    pool = torch.mean(n2, [1], False, None)
        |    fc = self.fc
        |    return (fc).forward(pool, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("enc", "enc", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "EncoderAttnOp", "SeqLayerNormOp",
        "PosFfnOp", "SeqLayerNormOp", "SeqMeanPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val ea = m.ops(1).asInstanceOf[EncoderAttnOp]
    assert(ea.heads.length == 2 && ea.residual && ea.proj.isDefined && ea.outDim == d)
    assert(ea.heads(0).wq.toSeq == wq1.toSeq && ea.heads(1).wv.toSeq == wv2.toSeq)
    assert(m.ops(3).asInstanceOf[PosFfnOp].residual)

    // independent all-f64 recompute
    val toks = Array(3, 0, 6, 2, 5)
    val L = toks.length
    val x = Array.tabulate(L, d)((p, j) => ew(toks(p) * d + j).toDouble)
    def headOut(wq: Array[Float], bq: Array[Float], wk: Array[Float], bk: Array[Float],
        wv: Array[Float], bv: Array[Float]): Array[Array[Double]] = {
      def pr(w: Array[Float], b: Array[Float]) = Array.tabulate(L, hd)((p, o) =>
        b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
      val (qm, km, vm) = (pr(wq, bq), pr(wk, bk), pr(wv, bv))
      Array.tabulate(L) { a =>
        val sc = Array.tabulate(L)(b0 =>
          (0 until hd).map(j => qm(a)(j) * km(b0)(j)).sum / 1.4142135623730951)
        val mx = sc.max
        val es = sc.map(s0 => math.exp(s0 - mx))
        val z = es.sum
        Array.tabulate(hd)(j => (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z)
      }
    }
    val h1 = headOut(wq1, bq1, wk1, bk1, wv1, bv1)
    val h2 = headOut(wq2, bq2, wk2, bk2, wv2, bv2)
    def lnF(y: Array[Double], g: Array[Float], b: Array[Float]): Array[Double] = {
      val mean = y.sum / d
      val va = y.map(v => (v - mean) * (v - mean)).sum / d
      val inv = 1.0 / math.sqrt(va + 1e-5)
      Array.tabulate(d)(j => (y(j) - mean) * inv * g(j) + b(j))
    }
    val pooled = new Array[Double](d)
    for (p <- 0 until L) {
      val cat = h1(p) ++ h2(p)
      val pj = Array.tabulate(d)(o => bp(o) + (0 until d).map(j => cat(j) * wp(o * d + j)).sum)
      val r = Array.tabulate(d)(j => x(p)(j) + pj(j))
      val n1 = lnF(r, g1, be1)
      val mid = Array.tabulate(8)(h =>
        math.max(0.0, b1(h) + (0 until d).map(j => n1(j) * w1(h * d + j)).sum))
      val f2 = Array.tabulate(d)(o => b2(o) + (0 until 8).map(h => mid(h) * w2(o * 8 + h)).sum)
      val n2 = lnF(Array.tabulate(d)(j => n1(j) + f2(j)), g2, be2)
      for (j <- 0 until d) pooled(j) += n2(j) / L
    }
    val expected = mm(pooled, wf, bf, 3, d)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 3) assert(math.abs(got(j) - expected(j)) < 1e-4,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // single-token row stays finite (softmax over one position)
    assert(!m.forwardTokens(Array(1)).exists(v => v.isNaN || v.isInfinite))
  }

  test("RNN misuse fails loudly: seq output consumed, num_layers > 1, batch_first=False") {
    val (vocab, emb, h) = (4, 2, 3)
    val ew = vals(vocab * emb, 81)
    def net(gru: Module, body: String): (Module, Map[String, String]) = (
      Module("__torch__.BadRnn", Seq(
        "training" -> B(false),
        "emb" -> Module(EmbeddingCls, Seq(
          "weight" -> Tensor(Seq(vocab, emb), ew),
          "padding_idx" -> NoneV,
          "training" -> B(false))),
        "gru" -> gru,
        "fc" -> linear(vals(2 * h, 82), 2, h, vals(2, 83)))),
      Map("code/__torch__.py" ->
        s"""class BadRnn(Module):
           |  training : bool
           |  def forward(self: __torch__.BadRnn,
           |    x: Tensor) -> Tensor:
           |    emb = self.emb
           |    e = (emb).forward(x, )
           |    gru = self.gru
           |$body
           |""".stripMargin))
    val ok = rnn(GruCls, vals(3 * h * emb, 84), vals(3 * h * h, 85),
      vals(3 * h, 86), vals(3 * h, 87), emb, h)
    // classifying the full-sequence output has no home in the op chain
    val (m1, c1) = net(ok,
      """    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    fc = self.fc
        |    return (fc).forward(out, )""".stripMargin)
    val seqUse = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badrnn1", "badrnn1", m1, c1)))
    assert(seqUse.getMessage.contains("full-sequence output"), seqUse.getMessage)
    // a stacked RNN missing its layer-1 weights fails loudly at load
    val two = rnn(GruCls, vals(3 * h * emb, 84), vals(3 * h * h, 85),
      vals(3 * h, 86), vals(3 * h, 87), emb, h, numLayers = 2)
    val (m2, c2) = net(two,
      """    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    h = torch.squeeze(hn, 0)
        |    fc = self.fc
        |    return (fc).forward(h, )""".stripMargin)
    val layers = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badrnn2", "badrnn2", m2, c2)))
    assert(layers.getMessage.contains("weight_ih_l1"), layers.getMessage)
    // squeeze(0) on a WEIGHTED 2-layer h_n is a torch no-op (the dim is
    // size 2) -> the downstream fc would see (2, n, H); reject loudly
    val two2 = rnn(GruCls, vals(3 * h * emb, 84), vals(3 * h * h, 85),
      vals(3 * h, 86), vals(3 * h, 87), emb, h, numLayers = 2,
      extraLayers = Seq((vals(3 * h * h, 88), vals(3 * h * h, 89),
        vals(3 * h, 90), vals(3 * h, 91))))
    val (m2b, c2b) = net(two2,
      """    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    h = torch.squeeze(hn, 0)
        |    fc = self.fc
        |    return (fc).forward(h, )""".stripMargin)
    val sq = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badrnn2b", "badrnn2b", m2b, c2b)))
    assert(sq.getMessage.contains("no-op"), sq.getMessage)
    // ...and h_n[0] reads the BOTTOM layer, not a classifier read-out
    val (m2c, c2c) = net(two2,
      """    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    h = torch.select(hn, 0, 0)
        |    fc = self.fc
        |    return (fc).forward(h, )""".stripMargin)
    val bottom = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badrnn2c", "badrnn2c", m2c, c2c)))
    assert(bottom.getMessage.contains("BOTTOM"), bottom.getMessage)
    // batch_first=False would silently transpose the batch: reject
    val bf = rnn(GruCls, vals(3 * h * emb, 84), vals(3 * h * h, 85),
      vals(3 * h, 86), vals(3 * h, 87), emb, h, batchFirst = false)
    val (m3, c3) = net(bf,
      """    _0 = (gru).forward(e, None, )
        |    out, hn, = _0
        |    h = torch.squeeze(hn, 0)
        |    fc = self.fc
        |    return (fc).forward(h, )""".stripMargin)
    val bfErr = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badrnn3", "badrnn3", m3, c3)))
    assert(bfErr.getMessage.contains("batch_first"), bfErr.getMessage)
  }

  test("Conv2d vision archive: pixel input -> conv -> relu -> global pool -> fc, golden vs f64") {
    // 2-channel 4x5 input -> Conv2d(2->3, 2x2) -> relu ->
    // AdaptiveMaxPool2d(1) -> flatten -> Linear(3->2)
    val (ic, oc, kh, kw, h, w) = (2, 3, 2, 2, 4, 5)
    val cw = vals(oc * ic * kh * kw, 131); val cb = vals(oc, 132)
    val (wf, bf) = (vals(2 * oc, 133), vals(2, 134))
    val model = Module("__torch__.VisNet", Seq(
      "training" -> B(false),
      "conv" -> conv2d(cw, oc, ic, kh, kw, cb),
      "pool" -> Module(AdaptiveMaxPool2dCls, Seq(
        "output_size" -> I(1), "return_indices" -> B(false), "training" -> B(false))),
      "fc" -> linear(wf, 2, oc, bf)))
    val code = Map("code/__torch__.py" ->
      """class VisNet(Module):
        |  training : bool
        |  def forward(self: __torch__.VisNet,
        |    x: Tensor) -> Tensor:
        |    conv = self.conv
        |    c = (conv).forward(x, )
        |    r = torch.relu(c)
        |    pool = self.pool
        |    p = (pool).forward(r, )
        |    f = torch.flatten(p, 1)
        |    fc = self.fc
        |    return (fc).forward(f, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("vis", "vis", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("Conv2dOp", "ActOp", "GlobalPool2dOp", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    assert(m.imageHead.isDefined && m.inDim == -1)
    val px = vals(ic * h * w, 135).map(v => math.abs(v) % 1.0f)
    // f64 reference
    val conv = Array.tabulate(oc, h - kh + 1, w - kw + 1) { (o, i, j) =>
      var acc: Double = cb(o)
      for (d <- 0 until ic; r <- 0 until kh; q <- 0 until kw)
        acc += cw(((o * ic + d) * kh + r) * kw + q) * px(d * h * w + (i + r) * w + (j + q))
      math.max(0.0, acc)
    }
    val pooled = Array.tabulate(oc)(o => conv(o).flatten.max)
    val expected = mm(pooled, wf, bf, 2, oc)
    val got = m.forwardImageBatch(Array(px), ic, h, w)
    for (j <- 0 until 2) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // misuse: a second Conv2d after the pool must fail at construction
    val bad = intercept[IllegalArgumentException](new TorchScriptModel(IndexedSeq(
      Conv2dOp(cw, cb, oc, ic, kh, kw, 1), GlobalPool2dOp(max = true),
      Conv2dOp(vals(oc * oc * 4, 136), vals(oc, 137), oc, oc, 2, 2, 1),
      LinearLayer(wf, bf, 2, oc))))
    assert(bad.getMessage.contains("Conv2d"), bad.getMessage)
  }

  test("dilated Conv2d (atrous): 'same' trace pad = dilation*(k-1)/2, golden vs f64 recompute") {
    val (ic, h, w, oc, k) = (2, 6, 6, 3, 3)
    val cw = vals(oc * ic * k * k, 351); val cb = vals(oc, 352)
    val (wf, bf) = (vals(2 * oc, 353), vals(2, 354))
    val model = Module("__torch__.Atrous", Seq(
      "training" -> B(false),
      "conv" -> conv2d(cw, oc, ic, k, k, cb, dilation = 2, paddingStr = "same"),
      "pool" -> Module(AdaptiveMaxPool2dCls, Seq(
        "output_size" -> I(1), "return_indices" -> B(false), "training" -> B(false))),
      "fc" -> linear(wf, 2, oc, bf)))
    val code = Map("code/__torch__.py" ->
      """class Atrous(Module):
        |  training : bool
        |  def forward(self: __torch__.Atrous,
        |    x: Tensor) -> Tensor:
        |    conv = self.conv
        |    r = torch.relu((conv).forward(x, ))
        |    pool = self.pool
        |    f = torch.flatten((pool).forward(r, ), 1)
        |    fc = self.fc
        |    return (fc).forward(f, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("atrous", "atrous", model, code))
    val cv = m.ops.collectFirst { case c: Conv2dOp => c }.get
    assert(cv.dilation == 2 && cv.pad == 2 && cv.stride == 1, s"traced $cv")
    val px = vals(ic * h * w, 355).map(v => math.abs(v) % 1.0f)
    // f64 reference: 'same' keeps HxW; tap (r, q) reads (i + 2r - 2, j + 2q - 2)
    val conv = Array.tabulate(oc, h, w) { (o, i, j) =>
      var acc: Double = cb(o)
      for (d <- 0 until ic; r <- 0 until k; q <- 0 until k) {
        val (y, x) = (i + 2 * r - 2, j + 2 * q - 2)
        if (y >= 0 && y < h && x >= 0 && x < w)
          acc += cw(((o * ic + d) * k + r) * k + q) * px(d * h * w + y * w + x)
      }
      math.max(0.0, acc)
    }
    val pooled = Array.tabulate(oc)(o => conv(o).flatten.max)
    val expected = mm(pooled, wf, bf, 2, oc)
    val got = m.forwardImageBatch(Array(px), ic, h, w)
    for (j <- 0 until 2) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // an image smaller than the effective span fails loudly in valid mode
    val mv = new TorchScriptModel(IndexedSeq(
      Conv2dOp(cw, cb, oc, ic, k, k, 1, pad = 0, dilation = 2),
      GlobalPool2dOp(max = true), LinearLayer(wf, bf, 2, oc)))
    val small = intercept[IllegalArgumentException](
      mv.forwardImageBatch(Array(vals(ic * 4 * 4, 356)), ic, 4, 4))
    assert(small.getMessage.contains("dilation=2"), small.getMessage)
  }

  test("deep CNN archive: conv -> BatchNorm2d -> relu -> AvgPool2d -> conv -> pool -> fc") {
    val (ic, h, w) = (1, 6, 6)
    val cw1 = vals(2 * 1 * 2 * 2, 141); val cb1 = vals(2, 142)
    val (bnMean, bnVar) = (vals(2, 143), vals(2, 144).map(v => 1f + math.abs(v)))
    val (bnG, bnB) = (vals(2, 145).map(v => 1f + v * 0.2f), vals(2, 146))
    val cw2 = vals(3 * 2 * 2 * 2, 147); val cb2 = vals(3, 148)
    val (wf, bf) = (vals(2 * 3, 149), vals(2, 150))
    val model = Module("__torch__.DeepCnn", Seq(
      "training" -> B(false),
      "c1" -> conv2d(cw1, 2, ic, 2, 2, cb1),
      "bn" -> Module("__torch__.torch.nn.modules.batchnorm.BatchNorm2d", Seq(
        "running_mean" -> Tensor(Seq(2), bnMean),
        "running_var" -> Tensor(Seq(2), bnVar),
        "weight" -> Tensor(Seq(2), bnG),
        "bias" -> Tensor(Seq(2), bnB),
        "eps" -> F(1e-5), "num_features" -> I(2), "training" -> B(false))),
      "ap" -> Module("__torch__.torch.nn.modules.pooling.AvgPool2d", Seq(
        "kernel_size" -> I(2), "stride" -> I(2), "padding" -> I(0), "training" -> B(false))),
      "c2" -> conv2d(cw2, 3, 2, 2, 2, cb2),
      "pool" -> Module(AdaptiveMaxPool2dCls, Seq(
        "output_size" -> I(1), "return_indices" -> B(false), "training" -> B(false))),
      "fc" -> linear(wf, 2, 3, bf)))
    val code = Map("code/__torch__.py" ->
      """class DeepCnn(Module):
        |  training : bool
        |  def forward(self: __torch__.DeepCnn,
        |    x: Tensor) -> Tensor:
        |    c = (self.c1).forward(x, )
        |    b = (self.bn).forward(c, )
        |    r = torch.relu(b)
        |    a = (self.ap).forward(r, )
        |    c2 = (self.c2).forward(a, )
        |    p = (self.pool).forward(c2, )
        |    f = torch.flatten(p, 1)
        |    return (self.fc).forward(f, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("deepcnn", "deepcnn", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("Conv2dOp", "ChannelAffineOp", "ActOp", "AvgPool2dOp",
        "Conv2dOp", "GlobalPool2dOp", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val px = vals(ic * h * w, 151).map(v => math.abs(v) % 1.0f)
    // f64 reference
    def convRef(in: Array[Double], ic0: Int, h0: Int, w0: Int,
        cw: Array[Float], cb: Array[Float], oc: Int): (Array[Double], Int, Int) = {
      val (oh, ow) = (h0 - 1, w0 - 1)
      val out = new Array[Double](oc * oh * ow)
      for (o <- 0 until oc; i <- 0 until oh; j <- 0 until ow) {
        var acc: Double = cb(o)
        for (d <- 0 until ic0; r <- 0 until 2; q <- 0 until 2)
          acc += cw(((o * ic0 + d) * 2 + r) * 2 + q) * in(d * h0 * w0 + (i + r) * w0 + (j + q))
        out((o * oh + i) * ow + j) = acc
      }
      (out, oh, ow)
    }
    val (c1o, h1, w1) = convRef(px.map(_.toDouble), ic, h, w, cw1, cb1, 2)
    // folded BN (f32 scale/shift, like the engine) then relu
    val scale = Array.tabulate(2)(i => (bnG(i) / math.sqrt(bnVar(i).toDouble + 1e-5)).toFloat)
    val shift = Array.tabulate(2)(i => bnB(i) - bnMean(i) * scale(i))
    val bno = Array.tabulate(c1o.length)(i =>
      math.max(0.0, c1o(i) * scale(i / (h1 * w1)) + shift(i / (h1 * w1))))
    // 2x2/2 avg pool
    val (h2, w2) = (h1 / 2, w1 / 2)
    val ap = new Array[Double](2 * h2 * w2)
    for (d <- 0 until 2; i <- 0 until h2; j <- 0 until w2)
      ap((d * h2 + i) * w2 + j) = (bno(d * h1 * w1 + (2 * i) * w1 + 2 * j) +
        bno(d * h1 * w1 + (2 * i) * w1 + 2 * j + 1) +
        bno(d * h1 * w1 + (2 * i + 1) * w1 + 2 * j) +
        bno(d * h1 * w1 + (2 * i + 1) * w1 + 2 * j + 1)) / 4.0
    val (c2o, h3, w3) = convRef(ap, 2, h2, w2, cw2, cb2, 3)
    val pooled = Array.tabulate(3)(o =>
      (0 until h3 * w3).map(q => c2o(o * h3 * w3 + q)).max)
    val expected = mm(pooled, wf, bf, 2, 3)
    val got = m.forwardImageBatch(Array(px), ic, h, w)
    for (j <- 0 until 2) assert(math.abs(got(j) - expected(j)) < 1e-4,
      s"logit $j: ${got(j)} vs ${expected(j)}")
  }

  test("ResNet basic block: same-padded convs + BN fused into ResBlock2dOp, golden vs f64") {
    // stem Conv2d(1->3, k3, pad 1) -> relu -> [conv3x3 -> BN -> relu ->
    // conv3x3 -> BN] + identity -> relu -> global avg pool -> fc
    val (h, w) = (5, 5)
    val sw = vals(3 * 1 * 3 * 3, 201); val sb = vals(3, 202)
    val c1w = vals(3 * 3 * 3 * 3, 203); val c1b = vals(3, 204)
    val (m1, v1) = (vals(3, 205), vals(3, 206).map(v => 1f + math.abs(v)))
    val (g1, be1) = (vals(3, 207).map(v => 1f + v * 0.2f), vals(3, 208))
    val c2w = vals(3 * 3 * 3 * 3, 209); val c2b = vals(3, 210)
    val (m2, v2) = (vals(3, 211), vals(3, 212).map(v => 1f + math.abs(v)))
    val (g2, be2) = (vals(3, 213).map(v => 1f + v * 0.2f), vals(3, 214))
    val (wf, bf) = (vals(2 * 3, 215), vals(2, 216))
    def bn(mean: Array[Float], vr: Array[Float], g: Array[Float], b: Array[Float]) =
      Module("__torch__.torch.nn.modules.batchnorm.BatchNorm2d", Seq(
        "running_mean" -> Tensor(Seq(3), mean), "running_var" -> Tensor(Seq(3), vr),
        "weight" -> Tensor(Seq(3), g), "bias" -> Tensor(Seq(3), b),
        "eps" -> F(1e-5), "num_features" -> I(3), "training" -> B(false)))
    val model = Module("__torch__.ResNetTiny", Seq(
      "training" -> B(false),
      "stem" -> conv2d(sw, 3, 1, 3, 3, sb, padding = 1),
      "c1" -> conv2d(c1w, 3, 3, 3, 3, c1b, padding = 1),
      "bn1" -> bn(m1, v1, g1, be1),
      "c2" -> conv2d(c2w, 3, 3, 3, 3, c2b, padding = 1),
      "bn2" -> bn(m2, v2, g2, be2),
      "pool" -> Module("__torch__.torch.nn.modules.pooling.AdaptiveAvgPool2d", Seq(
        "output_size" -> I(1), "training" -> B(false))),
      "fc" -> linear(wf, 2, 3, bf)))
    val code = Map("code/__torch__.py" ->
      """class ResNetTiny(Module):
        |  training : bool
        |  def forward(self: __torch__.ResNetTiny,
        |    x: Tensor) -> Tensor:
        |    s = torch.relu((self.stem).forward(x, ))
        |    c1 = (self.c1).forward(s, )
        |    b1 = (self.bn1).forward(c1, )
        |    r1 = torch.relu(b1)
        |    c2 = (self.c2).forward(r1, )
        |    b2 = (self.bn2).forward(c2, )
        |    y = torch.add(s, b2)
        |    y0 = torch.relu(y)
        |    p = (self.pool).forward(y0, )
        |    f = torch.flatten(p, 1)
        |    return (self.fc).forward(f, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("resnet", "resnet", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("Conv2dOp", "ActOp", "ResBlock2dOp", "ActOp",
        "GlobalPool2dOp", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val blk = m.ops(2).asInstanceOf[ResBlock2dOp]
    assert(blk.stages.map(_.getClass.getSimpleName) ==
      IndexedSeq("Conv2dOp", "ChannelAffineOp", "ActOp", "Conv2dOp", "ChannelAffineOp"))
    assert(blk.ch == 3 && blk.stages.collect { case c: Conv2dOp => c }.forall(_.shapePreserving))

    // all-f64 reference with the engine's f32 BN fold
    val px = vals(h * w, 217).map(v => math.abs(v) % 1.0f)
    def conv(in: Array[Double], ic: Int, cw: Array[Float], cb: Array[Float],
        oc: Int): Array[Double] = { // same-padded 3x3, H/W preserved
      val out = new Array[Double](oc * h * w)
      for (o <- 0 until oc; i <- 0 until h; j <- 0 until w) {
        var acc: Double = cb(o)
        for (d <- 0 until ic; r <- 0 until 3; q <- 0 until 3) {
          val (y, x) = (i + r - 1, j + q - 1)
          if (y >= 0 && y < h && x >= 0 && x < w)
            acc += cw(((o * ic + d) * 3 + r) * 3 + q) * in(d * h * w + y * w + x)
        }
        out((o * h + i) * w + j) = acc
      }
      out
    }
    def bnFold(in: Array[Double], mean: Array[Float], vr: Array[Float],
        g: Array[Float], b: Array[Float]): Array[Double] = {
      val scale = Array.tabulate(3)(i => (g(i) / math.sqrt(vr(i).toDouble + 1e-5)).toFloat)
      val shift = Array.tabulate(3)(i => b(i) - mean(i) * scale(i))
      Array.tabulate(in.length)(i => in(i) * scale(i / (h * w)) + shift(i / (h * w)))
    }
    val stem = conv(px.map(_.toDouble), 1, sw, sb, 3).map(v => math.max(0.0, v))
    val b1o = bnFold(conv(stem, 3, c1w, c1b, 3), m1, v1, g1, be1).map(v => math.max(0.0, v))
    val b2o = bnFold(conv(b1o, 3, c2w, c2b, 3), m2, v2, g2, be2)
    val res = Array.tabulate(stem.length)(i => math.max(0.0, stem(i) + b2o(i)))
    val pooled = Array.tabulate(3)(o => (0 until h * w).map(q => res(o * h * w + q)).sum / (h * w))
    val expected = mm(pooled, wf, bf, 2, 3)
    val got = m.forwardImageBatch(Array(px), 1, h, w)
    for (j <- 0 until 2) assert(math.abs(got(j) - expected(j)) < 1e-4,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // misuse: a stride-2 conv inside a residual pipe fails at fuse time
    val badModel = Module("__torch__.BadRes", Seq(
      "training" -> B(false),
      "stem" -> conv2d(sw, 3, 1, 3, 3, sb, padding = 1),
      "c1" -> conv2d(c1w, 3, 3, 3, 3, c1b, padding = 1, stride = 2),
      "pool" -> Module("__torch__.torch.nn.modules.pooling.AdaptiveAvgPool2d", Seq(
        "output_size" -> I(1), "training" -> B(false))),
      "fc" -> linear(wf, 2, 3, bf)))
    val badCode = Map("code/__torch__.py" ->
      """class BadRes(Module):
        |  training : bool
        |  def forward(self: __torch__.BadRes,
        |    x: Tensor) -> Tensor:
        |    s = (self.stem).forward(x, )
        |    c1 = (self.c1).forward(s, )
        |    y = torch.add(s, c1)
        |    p = (self.pool).forward(y, )
        |    f = torch.flatten(p, 1)
        |    return (self.fc).forward(f, )
        |""".stripMargin)
    val e = intercept[RuntimeException](
      TorchScriptModel.load(writeTemp("badres", "badres", badModel, badCode)))
    assert(e.getMessage.contains("preserve shape"), e.getMessage)
  }

  test("two stacked encoder blocks chain through the op list") {
    // block = 1-head attention + residual + LN + FFN + residual + LN;
    // stacking twice must trace to the doubled op sequence and execute
    val (vocab, d) = (6, 4)
    val ew = vals(vocab * d, 161)
    def lnMod(g: Array[Float], b: Array[Float]) = Module(
      "__torch__.torch.nn.modules.normalization.LayerNorm", Seq(
        "weight" -> Tensor(Seq(d), g), "bias" -> Tensor(Seq(d), b),
        "eps" -> F(1e-5), "training" -> B(false)))
    def blockAttrs(k: Int): Seq[(String, V)] = Seq(
      s"q$k" -> linear(vals(d * d, 162 + 10 * k), d, d, vals(d, 163 + 10 * k)),
      s"k$k" -> linear(vals(d * d, 164 + 10 * k), d, d, vals(d, 165 + 10 * k)),
      s"v$k" -> linear(vals(d * d, 166 + 10 * k), d, d, vals(d, 167 + 10 * k)),
      s"ln$k" -> lnMod(vals(d, 168 + 10 * k).map(v => 1f + v * 0.1f), vals(d, 169 + 10 * k)),
      s"f1$k" -> linear(vals(8 * d, 170 + 10 * k), 8, d, vals(8, 171 + 10 * k)),
      s"f2$k" -> linear(vals(d * 8, 172 + 10 * k), d, 8, vals(d, 173 + 10 * k)),
      s"lm$k" -> lnMod(vals(d, 174 + 10 * k).map(v => 1f + v * 0.1f), vals(d, 175 + 10 * k)))
    val model = Module("__torch__.Enc2", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, d), ew),
        "padding_idx" -> NoneV, "training" -> B(false)))) ++
      blockAttrs(0) ++ blockAttrs(1) ++ Seq(
      "fc" -> linear(vals(3 * d, 190), 3, d, vals(3, 191))))
    def blockCode(k: Int, in: String, out: String): String =
      s"""    q$k = (self.q$k).forward($in, )
         |    k$k = torch.transpose((self.k$k).forward($in, ), -2, -1)
         |    s$k = torch.div(torch.matmul(q$k, k$k), 2.)
         |    o$k = torch.matmul(torch.softmax(s$k, -1), (self.v$k).forward($in, ))
         |    r$k = torch.add($in, o$k)
         |    n$k = (self.ln$k).forward(r$k, )
         |    g$k = torch.relu((self.f1$k).forward(n$k, ))
         |    h$k = (self.f2$k).forward(g$k, )
         |    t$k = torch.add(n$k, h$k)
         |    $out = (self.lm$k).forward(t$k, )""".stripMargin
    val code = Map("code/__torch__.py" ->
      s"""class Enc2(Module):
         |  training : bool
         |  def forward(self: __torch__.Enc2,
         |    x: Tensor) -> Tensor:
         |    e = (self.emb).forward(x, )
         |${blockCode(0, "e", "e0")}
         |${blockCode(1, "e0", "e1")}
         |    p = torch.mean(e1, [1], False, None)
         |    return (self.fc).forward(p, )
         |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("enc2", "enc2", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp",
        "EncoderAttnOp", "SeqLayerNormOp", "PosFfnOp", "SeqLayerNormOp",
        "EncoderAttnOp", "SeqLayerNormOp", "PosFfnOp", "SeqLayerNormOp",
        "SeqMeanPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val out = m.forwardTokens(Array(3, 0, 5, 2))
    assert(out.length == 3 && !out.exists(v => v.isNaN || v.isInfinite))
    // batch path bit-equal to single-row
    val batch = m.forwardTokensBatch(Array(Array(3, 0, 5, 2), Array(1)))
    for (j <- 0 until 3) assert(batch(j) == out(j))
  }

  test("learned positional embeddings + CLS pooling: traces to PosEmbedOp/SeqClsPoolOp, golden vs f64") {
    // BERT-style read-out: token ids (caller prepends [CLS]) ->
    // Embedding(8, 4) + pos_emb(arange(L)) -> single-head attention ->
    // x[:, 0] -> Linear(4->3); generated code spells the position ramp
    // as torch.arange(torch.size(e, 1), None, None, None, None) and
    // the CLS read-out as torch.select(o, 1, 0)
    val vocab = 8; val d = 4; val maxLen = 16
    val ew = vals(vocab * d, 61)
    val pw = vals(maxLen * d, 62)
    val (wq, bq) = (vals(16, 63), vals(4, 64))
    val (wk, bk) = (vals(16, 65), vals(4, 66))
    val (wv, bv) = (vals(16, 67), vals(4, 68))
    val (wf, bf) = (vals(12, 69), vals(3, 70))
    val model = Module("__torch__.ClsNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, d), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "pos" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(maxLen, d), pw),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "q" -> linear(wq, 4, 4, bq),
      "k" -> linear(wk, 4, 4, bk),
      "v" -> linear(wv, 4, 4, bv),
      "fc" -> linear(wf, 3, 4, bf)))
    val code = Map("code/__torch__.py" ->
      """class ClsNet(Module):
        |  training : bool
        |  def forward(self: __torch__.ClsNet,
        |    x: Tensor) -> Tensor:
        |    e = (self.emb).forward(x, )
        |    n = torch.size(e, 1)
        |    ids = torch.arange(n, None, None, None, None)
        |    pe = (self.pos).forward(ids, )
        |    e0 = torch.add(e, pe)
        |    q = (self.q).forward(e0, )
        |    k = (self.k).forward(e0, )
        |    v = (self.v).forward(e0, )
        |    k0 = torch.transpose(k, -2, -1)
        |    s = torch.matmul(q, k0)
        |    s0 = torch.div(s, 2.)
        |    a = torch.softmax(s0, -1)
        |    o = torch.matmul(a, v)
        |    cls = torch.select(o, 1, 0)
        |    fc = self.fc
        |    return (fc).forward(cls, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("clsnet", "clsnet", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "PosEmbedOp", "SelfAttentionOp",
        "SeqClsPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val pe = m.ops(1).asInstanceOf[PosEmbedOp]
    assert(pe.maxLen == maxLen && pe.embDim == d && pe.weight.toSeq == pw.toSeq)
    // independent double math: x[p] = f32(tok_emb + pos_emb) per the
    // one-rounding-per-op boundary, attention in f64, CLS = row 0
    val toks = Array(3, 0, 6, 2, 5)
    val L = toks.length
    val x = Array.tabulate(L, d)((p, j) =>
      (ew(toks(p) * d + j).toDouble + pw(p * d + j).toDouble).toFloat.toDouble)
    def proj(w: Array[Float], b: Array[Float]): Array[Array[Double]] =
      Array.tabulate(L, d)((p, o) =>
        b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
    val (qm, km, vm) = (proj(wq, bq), proj(wk, bk), proj(wv, bv))
    val sc = Array.tabulate(L)(b0 => (0 until d).map(j => qm(0)(j) * km(b0)(j)).sum * 0.5)
    val mx = sc.max
    val es = sc.map(s0 => math.exp(s0 - mx))
    val z = es.sum
    val cls = Array.tabulate(d)(j => (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z)
    val expected = mm(cls, wf, bf, 3, 4)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 3) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // batch path bit-equal to single-row
    val batch = m.forwardTokensBatch(Array(toks, Array(1), Array(7, 2)))
    for (j <- 0 until 3) assert(batch(j) == got(j))
    // past the position table: fails exactly like torch's lookup
    val over = intercept[Exception](m.forwardTokens(Array.fill(maxLen + 1)(1)))
    assert(over.getMessage.contains("position"), over.getMessage)
  }

  test("depthwise (grouped) Conv2d archive: weight (out, in/groups, k, k) traces; channels stay grouped") {
    // MobileNet-style separable pair: pointwise Conv2d(1->3, k1) ->
    // relu -> DEPTHWISE Conv2d(3->3, k3, pad 1, groups=3) -> relu ->
    // AdaptiveMaxPool2d(1) -> flatten -> Linear(3->2)
    val (h, w) = (5, 5)
    val pwW = vals(3, 141); val pwB = vals(3, 142)
    val dwW = vals(3 * 1 * 3 * 3, 143); val dwB = vals(3, 144)
    val (wf, bf) = (vals(6, 145), vals(2, 146))
    val model = Module("__torch__.DwNet", Seq(
      "training" -> B(false),
      "pw" -> conv2d(pwW, 3, 1, 1, 1, pwB),
      "dw" -> conv2d(dwW, 3, 3, 3, 3, dwB, padding = 1, groups = 3),
      "pool" -> Module(AdaptiveMaxPool2dCls, Seq(
        "output_size" -> I(1), "return_indices" -> B(false), "training" -> B(false))),
      "fc" -> linear(wf, 2, 3, bf)))
    val code = Map("code/__torch__.py" ->
      """class DwNet(Module):
        |  training : bool
        |  def forward(self: __torch__.DwNet,
        |    x: Tensor) -> Tensor:
        |    pw = self.pw
        |    e = torch.relu((pw).forward(x, ))
        |    dw = self.dw
        |    d = torch.relu((dw).forward(e, ))
        |    pool = self.pool
        |    p = (pool).forward(d, )
        |    f = torch.flatten(p, 1)
        |    fc = self.fc
        |    return (fc).forward(f, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("dwnet", "dwnet", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("Conv2dOp", "ActOp", "Conv2dOp", "ActOp",
        "GlobalPool2dOp", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val dwOp = m.ops(2).asInstanceOf[Conv2dOp]
    assert(dwOp.groups == 3 && dwOp.inCh == 3 && dwOp.outCh == 3 &&
      dwOp.weight.length == 3 * 1 * 3 * 3)
    // f64 reference with the GROUPED channel rule (channel c reads only
    // channel c); same-padded
    val px = vals(h * w, 147).map(v => math.abs(v) % 1.0f)
    val e = Array.tabulate(3, h, w)((c, i, j) =>
      math.max(0.0, pwB(c) + pwW(c) * px(i * w + j)))
    val d = Array.tabulate(3, h, w) { (c, i, j) =>
      var acc: Double = dwB(c)
      for (di <- -1 to 1; dj <- -1 to 1
           if i + di >= 0 && i + di < h && j + dj >= 0 && j + dj < w)
        acc += dwW((c * 3 + (di + 1)) * 3 + (dj + 1)) * e(c)(i + di)(j + dj)
      math.max(0.0, acc)
    }
    val pooled = Array.tabulate(3)(c => d(c).flatten.max)
    val expected = mm(pooled, wf, bf, 2, 3)
    val got = m.forwardImageBatch(Array(px), 1, h, w)
    for (j <- 0 until 2) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // groups failing to divide out_channels fails loudly at load
    val bad = Module("__torch__.DwNet", model.attrs.map {
      case ("dw", _) => "dw" -> conv2d(vals(3 * 1 * 9, 148), 3, 2, 3, 3,
        vals(3, 149), padding = 1, groups = 2)
      case kv => kv
    })
    val e1 = intercept[Exception](
      TorchScriptModel.load(writeTemp("dwbad", "dwbad", bad, code)))
    assert(e1.getMessage.contains("groups"), e1.getMessage)
  }

  test("causal decoder: buffer PE slice + additive -inf mask + last-token select trace to the causal op") {
    // GPT-style read-out: Embedding(8, 4) + self.pe[:L] (a REGISTERED
    // BUFFER — the sinusoidal-PE serialized shape; values precomputed,
    // never traced through sin/cos) -> single-head attention with
    // scores + self.mask[:L, :L] (additive upper-triangular -inf) ->
    // x[:, -1] -> Linear(4->3). Generated code spells the slices as
    // torch.slice(t, dim, 0, n, 1).
    val vocab = 8; val d = 4; val maxLen = 12
    val ew = vals(vocab * d, 81)
    val pw = Array.tabulate(maxLen * d) { idx =>
      val pos = idx / d; val j = idx % d
      val angle = pos / math.pow(100.0, (2 * (j / 2)).toDouble / d)
      (if (j % 2 == 0) math.sin(angle) else math.cos(angle)).toFloat
    }
    val mask = Array.tabulate(maxLen * maxLen) { idx =>
      if (idx % maxLen <= idx / maxLen) 0f else Float.NegativeInfinity
    }
    val (wq, bq) = (vals(16, 83), vals(4, 84))
    val (wk, bk) = (vals(16, 85), vals(4, 86))
    val (wv, bv) = (vals(16, 87), vals(4, 88))
    val (wf, bf) = (vals(12, 89), vals(3, 90))
    val model = Module("__torch__.DecNet", Seq(
      "training" -> B(false),
      "pe" -> Tensor(Seq(maxLen, d), pw),
      "mask" -> Tensor(Seq(maxLen, maxLen), mask),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, d), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "q" -> linear(wq, 4, 4, bq),
      "k" -> linear(wk, 4, 4, bk),
      "v" -> linear(wv, 4, 4, bv),
      "fc" -> linear(wf, 3, 4, bf)))
    def codeFor(body: String) = Map("code/__torch__.py" ->
      (s"""class DecNet(Module):
          |  training : bool
          |  def forward(self: __torch__.DecNet,
          |    x: Tensor) -> Tensor:
          |    e = (self.emb).forward(x, )
          |    n = torch.size(e, 1)
          |$body
          |    fc = self.fc
          |    return (fc).forward(last, )
          |""".stripMargin))
    val goodBody =
      """    pe = torch.slice(self.pe, 0, 0, n, 1)
        |    e0 = torch.add(e, pe)
        |    q = (self.q).forward(e0, )
        |    k = (self.k).forward(e0, )
        |    v = (self.v).forward(e0, )
        |    k0 = torch.transpose(k, -2, -1)
        |    s = torch.matmul(q, k0)
        |    s0 = torch.div(s, 2.)
        |    m0 = torch.slice(self.mask, 0, 0, n, 1)
        |    m1 = torch.slice(m0, 1, 0, n, 1)
        |    s1 = torch.add(s0, m1)
        |    a = torch.softmax(s1, -1)
        |    o = torch.matmul(a, v)
        |    last = torch.select(o, 1, -1)""".stripMargin
    val m = TorchScriptModel.load(writeTemp("decnet", "decnet", model, codeFor(goodBody)))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "PosEmbedOp", "SelfAttentionOp",
        "SeqLastPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val pe = m.ops(1).asInstanceOf[PosEmbedOp]
    assert(pe.maxLen == maxLen && pe.embDim == d && pe.weight.toSeq == pw.toSeq)
    val at = m.ops(2).asInstanceOf[SelfAttentionOp]
    assert(at.causal && at.scale == 0.5)
    // independent double math: causal softmax (row a over 0..a), last row
    val toks = Array(3, 0, 6, 2, 5)
    val L = toks.length
    val x = Array.tabulate(L, d)((p, j) =>
      (ew(toks(p) * d + j).toDouble + pw(p * d + j).toDouble).toFloat.toDouble)
    def proj(w: Array[Float], b: Array[Float]): Array[Array[Double]] =
      Array.tabulate(L, d)((p, o) =>
        b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
    val (qm, km, vm) = (proj(wq, bq), proj(wk, bk), proj(wv, bv))
    val a0 = L - 1 // only the last row reaches the classifier
    val sc = Array.tabulate(L)(b0 => (0 until d).map(j => qm(a0)(j) * km(b0)(j)).sum * 0.5)
    val mx = sc.max
    val es = sc.map(s0 => math.exp(s0 - mx))
    val z = es.sum
    val lastVec = Array.tabulate(d)(j => (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z)
    val expected = mm(lastVec, wf, bf, 3, 4)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 3) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs ${expected(j)}")
    // (row L-1 attends every position, so last-pool output alone cannot
    // distinguish causal from full attention — the BEHAVIORAL causal
    // pin is TorchDecoderSpec's mean-pooled f64 recompute, where rows
    // a < L-1 are prefix-limited)
    // a NON-causal mask buffer is carried as the GENERAL additive bias
    // (position (0, 1) visible) — not the causal flag (TorchAlibiSpec
    // pins the bias arithmetic; here only the classification)
    val badMask = mask.clone(); badMask(1) = 0f // (0, 1) open, not -inf
    val badModel = Module("__torch__.DecNet", model.attrs.map {
      case ("mask", _) => "mask" -> Tensor(Seq(maxLen, maxLen), badMask)
      case kv => kv
    })
    val m1 = TorchScriptModel.load(
      writeTemp("decbias", "decbias", badModel, codeFor(goodBody)))
    val at1 = m1.ops.collectFirst { case a: SelfAttentionOp => a }.get
    assert(!at1.causal && at1.biasRows == maxLen &&
      at1.bias.get.toSeq == badMask.toSeq)
    // a slice bounded by anything but the live length fails
    val e2 = intercept[Exception](
      TorchScriptModel.load(writeTemp("decbad2", "decbad2", model, codeFor(
        goodBody.replace("torch.slice(self.pe, 0, 0, n, 1)",
          "torch.slice(self.pe, 0, 0, 4, 1)")))))
    assert(e2.getMessage.contains("slice end"), e2.getMessage)
  }

  test("CLS select on a non-zero index and sinusoidal-computed positions fail loudly") {
    val vocab = 4; val d = 2
    def net(body: String) = {
      val model = Module("__torch__.BadCls", Seq(
        "training" -> B(false),
        "emb" -> Module(EmbeddingCls, Seq(
          "weight" -> Tensor(Seq(vocab, d), vals(vocab * d, 71)),
          "padding_idx" -> NoneV,
          "training" -> B(false))),
        "fc" -> linear(vals(6, 72), 3, 2, vals(3, 73))))
      val code = Map("code/__torch__.py" ->
        (s"""class BadCls(Module):
           |  training : bool
           |  def forward(self: __torch__.BadCls,
           |    x: Tensor) -> Tensor:
           |    e = (self.emb).forward(x, )
           |$body
           |    fc = self.fc
           |    return (fc).forward(cls, )
           |""".stripMargin))
      TorchScriptModel.load(writeTemp("badcls", "badcls", model, code))
    }
    // select(1, 1): only the position-0 CLS read-out has a home
    val e1 = intercept[Exception](net("    cls = torch.select(e, 1, 1)"))
    assert(e1.getMessage.contains("CLS"), e1.getMessage)
    // computed (sinusoidal) encodings: torch.sin has no traced home
    val e2 = intercept[Exception](net(
      "    p = torch.sin(e)\n    cls = torch.select(p, 1, 0)"))
    assert(e2.getMessage.contains("unsupported function"), e2.getMessage)
  }

  test("RMSNorm and GLU between linears: Llama-norm then gated halving (flat)") {
    // x(2) -> fc1(2->4) -> RMSNorm(4) -> fc2(4->4) -> GLU -> (2)
    val (w0, b0) = (vals(8, 301), vals(4, 302))
    val g = vals(4, 303).map(v => 1f + v * 0.1f)
    val (w1, b1) = (vals(16, 304), vals(4, 305))
    val eps = 1e-6
    val model = Module("__torch__.RGNet", Seq(
      "training" -> B(false),
      "fc1" -> linear(w0, 4, 2, b0),
      "rms" -> Module("__torch__.torch.nn.modules.normalization.RMSNorm", Seq(
        "weight" -> Tensor(Seq(4), g),
        "eps" -> F(eps),
        "normalized_shape" -> Tup(Seq(I(4))),
        "training" -> B(false))),
      "fc2" -> linear(w1, 4, 4, b1),
      "glu" -> Module("__torch__.torch.nn.modules.activation.GLU", Seq(
        "dim" -> I(-1), "training" -> B(false)))))
    val code = Map("code/__torch__.py" ->
      """class RGNet(Module):
        |  training : bool
        |  def forward(self: __torch__.RGNet,
        |    x: Tensor) -> Tensor:
        |    h = (self.rms).forward((self.fc1).forward(x, ), )
        |    h2 = (self.fc2).forward(h, )
        |    return (self.glu).forward(h2, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("rgnet", "rgnet", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      Seq("LinearLayer", "RmsNormOp", "LinearLayer", "GluOp$"),
      m.ops.map(_.getClass.getSimpleName).toString)
    assert(m.outDim == 4) // outDim reads the last Linear; GLU halves at run time

    val x = Array(0.7, -1.2)
    val h = mm(x, w0, b0, 4, 2)
    val ms = h.map(v => v * v).sum / 4
    val inv = 1.0 / math.sqrt(ms + eps)
    val rn = h.indices.map(j => h(j) * inv * g(j)).toArray
    val h2 = mm(rn, w1, b1, 4, 4)
    val expected = Array.tabulate(2)(j => h2(j) / (1.0 + math.exp(-h2(2 + j))))
    val got = m.forward(x.map(_.toFloat))
    assert(got.length == 2)
    for (j <- 0 until 2)
      assert(math.abs(got(j) - expected(j)) < 1e-4, s"out[$j]: ${got(j)} vs ${expected(j)}")
  }

  test("RMSNorm eps=None resolves to finfo(float32).eps; affine=False means unit gamma") {
    val (w0, b0) = (vals(8, 311), vals(4, 312))
    val model = Module("__torch__.RNet", Seq(
      "training" -> B(false),
      "fc1" -> linear(w0, 4, 2, b0),
      "rms" -> Module("__torch__.torch.nn.modules.normalization.RMSNorm", Seq(
        "weight" -> NoneV, // elementwise_affine=False
        "eps" -> NoneV,
        "normalized_shape" -> Tup(Seq(I(4))),
        "training" -> B(false)))))
    val code = Map("code/__torch__.py" ->
      """class RNet(Module):
        |  training : bool
        |  def forward(self: __torch__.RNet,
        |    x: Tensor) -> Tensor:
        |    return (self.rms).forward((self.fc1).forward(x, ), )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("rnet", "rnet", model, code))
    val op = m.ops.collectFirst { case r: RmsNormOp => r }.get
    assert(op.eps == 1.1920928955078125e-7)
    assert(op.gamma.toSeq == Seq.fill(4)(1f))
  }

  test("sequence RMSNorm + GLU: per-position Llama norm and gated halving on the live sequence") {
    // token ids -> Embedding(8, 4) -> RMSNorm(4) -> GLU (4->2) ->
    // mean(dim=1) -> Linear(2->3)
    val (vocab, d) = (8, 4)
    val ew = vals(vocab * d, 321)
    val g = vals(d, 322).map(v => 1f + v * 0.1f)
    val (wf, bf) = (vals(3 * 2, 323), vals(3, 324))
    val eps = 1e-6
    val model = Module("__torch__.SRGNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, d), ew),
        "padding_idx" -> NoneV, "training" -> B(false))),
      "rms" -> Module("__torch__.torch.nn.modules.normalization.RMSNorm", Seq(
        "weight" -> Tensor(Seq(d), g),
        "eps" -> F(eps),
        "normalized_shape" -> Tup(Seq(I(d))),
        "training" -> B(false))),
      "glu" -> Module("__torch__.torch.nn.modules.activation.GLU", Seq(
        "dim" -> I(-1), "training" -> B(false))),
      "fc" -> linear(wf, 3, 2, bf)))
    val code = Map("code/__torch__.py" ->
      """class SRGNet(Module):
        |  training : bool
        |  def forward(self: __torch__.SRGNet,
        |    x: Tensor) -> Tensor:
        |    e = (self.emb).forward(x, )
        |    n = (self.rms).forward(e, )
        |    h = (self.glu).forward(n, )
        |    pool = torch.mean(h, [1], False, None)
        |    fc = self.fc
        |    return (fc).forward(pool, )
        |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("srg", "srg", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "SeqRmsNormOp", "SeqGluOp$",
        "SeqMeanPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)

    // independent all-f64 recompute
    val toks = Array(3, 0, 6, 2, 5)
    val L = toks.length
    val x = Array.tabulate(L, d)((p, j) => ew(toks(p) * d + j).toDouble)
    val gated = Array.tabulate(L, 2) { (p, j) =>
      val ms = x(p).map(v => v * v).sum / d
      val inv = 1.0 / math.sqrt(ms + eps)
      val a = x(p)(j) * inv * g(j)
      val b = x(p)(2 + j) * inv * g(2 + j)
      a / (1.0 + math.exp(-b))
    }
    val pool = Array.tabulate(2)(j => (0 until L).map(p => gated(p)(j)).sum / L)
    val expected = mm(pool, wf, bf, 3, 2)
    val got = m.forwardTokens(toks)
    for (j <- 0 until 3)
      assert(math.abs(got(j) - expected(j)) < 1e-4, s"out[$j]: ${got(j)} vs ${expected(j)}")
  }

  test("GLU rejects an odd feature width and a non-feature dim") {
    def net(dim: Long, inDim: Int): TorchScriptModel = {
      val model = Module("__torch__.GNet", Seq(
        "training" -> B(false),
        "fc" -> linear(vals(3 * inDim, 331), 3, inDim, vals(3, 332)),
        "glu" -> Module("__torch__.torch.nn.modules.activation.GLU", Seq(
          "dim" -> I(dim), "training" -> B(false)))))
      val code = Map("code/__torch__.py" ->
        """class GNet(Module):
          |  training : bool
          |  def forward(self: __torch__.GNet,
          |    x: Tensor) -> Tensor:
          |    return (self.glu).forward((self.fc).forward(x, ), )
          |""".stripMargin)
      TorchScriptModel.load(writeTemp("gnet", "gnet", model, code))
    }
    val e1 = intercept[Exception](net(-1, 2)) // fc out = 3: odd
    assert(e1.getMessage.contains("odd feature width"), e1.getMessage)
    val e2 = intercept[Exception](net(0, 2)) // batch dim: no home
    assert(e2.getMessage.contains("feature dim only"), e2.getMessage)
  }

  test("iris.spt traces through its serialized code: shared relu between linears") {
    val m = TorchScriptModel.load("/root/reference/model/iris.spt")
    // execution order from code/__torch__.py, NOT registration order
    // (the archive registers relu after all three linears)
    assert(m.ops.map(_.getClass.getSimpleName) ==
      Seq("LinearLayer", "ActOp", "LinearLayer", "ActOp", "LinearLayer"))
    assert(m.ops.collect { case ActOp(k) => k } == Seq("relu", "relu"))
  }
}
