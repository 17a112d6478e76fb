package graft.torch

import org.scalatest.funsuite.AnyFunSuite
import SptFixture._

/**
 * The padded-batch (`key_padding_mask`) contract, end to end: a traced
 * `torch.eq(ids, pad)` fed to `nn.MultiheadAttention` plus the traced
 * masked-mean read-out `(x * mask).sum(1) / lengths` must flip the
 * model head into padIdx mode, and every padded row must come out
 * BIT-IDENTICAL to the same row run unpadded (the engine's
 * unpadded-equivalent contract, see [[EmbeddingSeqOp]]) — torch users
 * get this via key_padding_mask + pack_padded_sequence + a lengths
 * gather (reference src/udf.rs:127 runs any such traced model through
 * libtorch; here the trace IS the program). Also pins the loud-failure
 * surface: interior pads, all-pad rows, conflicting pad ids, and a
 * mask taken on something other than the raw token-ids input.
 */
class TorchPaddedSpec extends AnyFunSuite {

  private def vals(n: Int, seed: Int): Array[Float] =
    Array.tabulate(n)(i => (math.sin(seed * 97 + i * 13.7) * 1.5).toFloat)

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

  private val (vocab, emb, heads, cls, pad) = (9, 4, 2, 3, 8)
  private val ew = vals(vocab * emb, 401)
  private val inW = vals(3 * emb * emb, 402); private val inB = vals(3 * emb, 403)
  private val outW = vals(emb * emb, 404); private val outB = vals(emb, 405)
  private val (wf, bf) = (vals(cls * emb, 406), vals(cls, 407))

  /** The padded-MHA fixture: eq mask -> MHA -> masked-mean -> fc. */
  private def padNet(body: String): (Module, Map[String, String]) = (
    Module("__torch__.PadNet", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "attn" -> mha(inW, inB, outW, outB, emb, heads),
      "fc" -> linear(wf, cls, emb, bf))),
    Map("code/__torch__.py" ->
      s"""class PadNet(Module):
         |  training : bool
         |  def forward(self: __torch__.PadNet,
         |    x: Tensor) -> Tensor:
         |$body
         |    fc = self.fc
         |    return (fc).forward(p, )
         |""".stripMargin))

  private val maskedMeanBody =
    s"""    mask = torch.eq(x, $pad)
       |    emb = self.emb
       |    e = (emb).forward(x, )
       |    attn = self.attn
       |    _0 = (attn).forward(e, e, e, mask, False, None, )
       |    a, _1, = _0
       |    vm = torch.logical_not(mask)
       |    fm = torch.to(vm, 6, False, False, None)
       |    fmc = torch.unsqueeze(fm, -1)
       |    xm = torch.mul(a, fmc)
       |    s = torch.sum(xm, [1], False, None)
       |    lens = torch.sum(fm, [1], True, None)
       |    p = torch.div(s, lens)""".stripMargin

  private lazy val tracedPadded: TorchScriptModel = {
    val (model, code) = padNet(maskedMeanBody)
    TorchScriptModel.load(writeTemp("padmha", "padmha", model, code))
  }

  test("trace: eq->MHA + (x*mask).sum(1)/lengths emits padIdx head + SeqMaskedMeanPoolOp") {
    val m = tracedPadded
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "EncoderAttnOp", "SeqMaskedMeanPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val e = m.ops.head.asInstanceOf[EmbeddingSeqOp]
    assert(e.padIdx == pad)
    val ea = m.ops(1).asInstanceOf[EncoderAttnOp]
    assert(ea.heads.length == heads && ea.proj.isDefined && !ea.residual)
  }

  test("padded batch is bit-identical to the unpadded rows; engine == all-f64 recompute") {
    val m = tracedPadded
    val rows = Array(
      Array(3, 0, 6, 2, 5, 1), // full length: no pads
      Array(7, 4, 2),
      Array(5),
      Array(0, 1, 2, 3, 4))
    val L = rows.map(_.length).max
    val padded = rows.map(r => r ++ Array.fill(L - r.length)(pad))
    val batch = m.forwardTokensBatch(padded)
    for ((r, i) <- rows.zipWithIndex) {
      val single = m.forwardTokens(r) // unpadded: valid == L, mask is all-true
      for (j <- 0 until cls)
        assert(batch(i * cls + j) == single(j),
          s"row $i logit $j: padded ${batch(i * cls + j)} vs unpadded ${single(j)}")
    }
    // all-f64 dense MHA recompute straight from the PACKED weights,
    // masked mean == plain mean over the valid rows
    for ((toks, i) <- rows.zipWithIndex) {
      val n = toks.length
      val x = Array.tabulate(n, emb)((p, j) => ew(toks(p) * emb + j).toDouble)
      def proj(off: Int): Array[Array[Double]] = Array.tabulate(n, emb)((p, o) =>
        inB(off * emb + o) + (0 until emb).map(j => x(p)(j) * inW((off * emb + o) * emb + j)).sum)
      val (qm, km, vm) = (proj(0), proj(1), proj(2))
      val hd = emb / heads
      val attn = Array.fill(n, emb)(0.0)
      for (h <- 0 until heads; p <- 0 until n) {
        val scale = 1.0 / math.sqrt(hd.toDouble)
        val sc = Array.tabulate(n)(b0 =>
          (0 until hd).map(j => qm(p)(h * hd + j) * km(b0)(h * hd + j)).sum * scale)
        val mx = sc.max
        val es = sc.map(s0 => math.exp(s0 - mx))
        val z = es.sum
        for (j <- 0 until hd)
          attn(p)(h * hd + j) = (0 until n).map(b0 => es(b0) * vm(b0)(h * hd + j)).sum / z
      }
      val pooled = new Array[Double](emb)
      for (p <- 0 until n) {
        val o = Array.tabulate(emb)(oi =>
          outB(oi) + (0 until emb).map(j => attn(p)(j) * outW(oi * emb + j)).sum)
        for (j <- 0 until emb) pooled(j) += o(j) / n
      }
      val expected = mm(pooled, wf, bf, cls, emb)
      val got = m.forwardTokens(toks)
      for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
        s"row $i logit $j: ${got(j)} vs f64 ${expected(j)}")
    }
  }

  test("interior pads and all-pad rows fail loudly") {
    val m = tracedPadded
    val interior = intercept[IllegalArgumentException](m.forwardTokens(Array(1, pad, 2)))
    assert(interior.getMessage.contains("interior pad"))
    val allPad = intercept[IllegalArgumentException](m.forwardTokens(Array(pad, pad)))
    assert(allPad.getMessage.contains("all-pad"))
  }

  test("conflicting pad ids between the attention mask and the mean mask fail loudly") {
    val (model, code) = padNet(
      s"""    mask = torch.eq(x, $pad)
         |    emb = self.emb
         |    e = (emb).forward(x, )
         |    attn = self.attn
         |    _0 = (attn).forward(e, e, e, mask, False, None, )
         |    a, _1, = _0
         |    vm = torch.ne(x, 2)
         |    fm = torch.to(vm, 6, False, False, None)
         |    fmc = torch.unsqueeze(fm, -1)
         |    xm = torch.mul(a, fmc)
         |    s = torch.sum(xm, [1], False, None)
         |    lens = torch.sum(fm, [1], True, None)
         |    p = torch.div(s, lens)""".stripMargin)
    val err = intercept[Exception](
      TorchScriptModel.load(writeTemp("padconf", "padconf", model, code)))
    assert(err.getMessage.contains("conflicting"), err.getMessage)
  }

  test("a mask taken on the embedding output (not the raw ids) fails loudly") {
    val (model, code) = padNet(
      s"""    emb = self.emb
         |    e = (emb).forward(x, )
         |    mask = torch.eq(e, $pad)
         |    attn = self.attn
         |    _0 = (attn).forward(e, e, e, mask, False, None, )
         |    a, _1, = _0
         |    p = torch.mean(a, [1], False, None)""".stripMargin)
    val err = intercept[Exception](
      TorchScriptModel.load(writeTemp("padraw", "padraw", model, code)))
    assert(err.getMessage.contains("eq on"), err.getMessage)
  }

  test("causal x padding composition: padded decoder rows == unpadded, last-VALID read-out") {
    // directly-constructed causal single-head attention + last pool in
    // padIdx mode — x[:, -1] reads the last VALID position (the
    // unpadded-equivalent contract), pinned against the unpadded run
    val at = SelfAttentionOp(
      vals(emb * emb, 411), vals(emb, 412), vals(emb * emb, 413), vals(emb, 414),
      vals(emb * emb, 415), vals(emb, 416), dim = emb, inDim = emb,
      scale = 0.5, causal = true)
    val m = new TorchScriptModel(IndexedSeq(
      EmbeddingSeqOp(ew, vocab, emb, padIdx = pad),
      at, SeqLastPoolOp, LinearLayer(wf, bf, cls, emb)))
    val un = new TorchScriptModel(IndexedSeq(
      EmbeddingSeqOp(ew, vocab, emb),
      at, SeqLastPoolOp, LinearLayer(wf, bf, cls, emb)))
    val rows = Array(Array(3, 0, 6, 2), Array(7, 4), Array(1))
    val L = rows.map(_.length).max
    val batch = m.forwardTokensBatch(rows.map(r => r ++ Array.fill(L - r.length)(pad)))
    for ((r, i) <- rows.zipWithIndex; j <- 0 until cls)
      assert(batch(i * cls + j) == un.forwardTokens(r)(j),
        s"row $i logit $j: padded+causal != unpadded")
  }

  test("packed RNN: padded GRU rows == unpadded (recurrence stops at the valid length)") {
    val hd = 3
    val r = RnnOp("gru", vals(3 * hd * emb, 421), vals(3 * hd * hd, 422),
      vals(3 * hd, 423), vals(3 * hd, 424), hidden = hd, inDim = emb)
    val m = new TorchScriptModel(IndexedSeq(
      EmbeddingSeqOp(ew, vocab, emb, padIdx = pad),
      r, LinearLayer(vals(cls * hd, 425), vals(cls, 426), cls, hd)))
    val un = new TorchScriptModel(IndexedSeq(
      EmbeddingSeqOp(ew, vocab, emb),
      r, LinearLayer(vals(cls * hd, 425), vals(cls, 426), cls, hd)))
    val rows = Array(Array(3, 0, 6, 2, 5), Array(7), Array(1, 2))
    val L = rows.map(_.length).max
    val batch = m.forwardTokensBatch(rows.map(r0 => r0 ++ Array.fill(L - r0.length)(pad)))
    for ((r0, i) <- rows.zipWithIndex; j <- 0 until cls)
      assert(batch(i * cls + j) == un.forwardTokens(r0)(j),
        s"row $i logit $j: packed padded != unpadded")
  }

  test("traced masked mean without attention: Embedding -> (x*mask).sum(1)/lengths -> fc") {
    val model = Module("__torch__.MMean", Seq(
      "training" -> B(false),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, emb), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "fc" -> linear(wf, cls, emb, bf)))
    val code = Map("code/__torch__.py" ->
      s"""class MMean(Module):
         |  training : bool
         |  def forward(self: __torch__.MMean,
         |    x: Tensor) -> Tensor:
         |    vm = torch.ne(x, $pad)
         |    emb = self.emb
         |    e = (emb).forward(x, )
         |    fm = torch.to(vm, 6, False, False, None)
         |    fmc = torch.unsqueeze(fm, -1)
         |    xm = torch.mul(e, fmc)
         |    s = torch.sum(xm, [1], False, None)
         |    lens = torch.sum(fm, [1], True, None)
         |    p = torch.div(s, lens)
         |    fc = self.fc
         |    return (fc).forward(p, )
         |""".stripMargin)
    val m = TorchScriptModel.load(writeTemp("mmean", "mmean", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "SeqMaskedMeanPoolOp$", "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    assert(m.ops.head.asInstanceOf[EmbeddingSeqOp].padIdx == pad)
    val toks = Array(3, 0, 6)
    val padded = toks ++ Array.fill(2)(pad)
    val got = m.forwardTokens(padded)
    // f64 golden: plain mean of the valid embedding rows through fc
    val pooled = Array.tabulate(emb)(j =>
      toks.map(t => ew(t * emb + j).toDouble).sum / toks.length)
    val expected = mm(pooled, wf, bf, cls, emb)
    for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
      s"logit $j: ${got(j)} vs f64 ${expected(j)}")
    assert(got.toSeq == m.forwardTokens(toks).toSeq)
  }
}
