package graft.torch

import org.scalatest.funsuite.AnyFunSuite
import SptFixture._

/**
 * Rotary position embeddings (RoPE, Su et al. 2021 — the
 * Llama/RoFormer encoding) traced from the canonical idiom applied to
 * the PROJECTED q and k:
 * `rope(x) = x·cos[:L] + rotate_half(x)·sin[:L]`,
 * `rotate_half(x) = cat([-x[..., h:], x[..., :h]], -1)`.
 * The cos/sin tables ride as registered buffers (serialized values,
 * never recomputed trig — the sinusoidal-PE discipline). Goldens are
 * computed in-test with independent double math.
 */
class TorchRopeSpec extends AnyFunSuite {

  private def mm(x: Array[Double], w: Array[Float], b: Array[Float],
      out: Int, in: Int): Array[Double] =
    Array.tabulate(out) { o =>
      var acc = b(o).toDouble
      var k = 0
      while (k < in) { acc += x(k) * w(o * in + k); k += 1 }
      acc
    }

  private def vals(n: Int, seed: Int): Array[Float] =
    Array.tabulate(n)(i => (math.sin(seed * 97 + i * 13.7) * 1.5).toFloat)

  private val maxLen = 12
  private val vocab = 8; private val d = 4; private val h = 2; private val cls = 3
  private val ew = vals(vocab * d, 601)
  private val (wq, bq) = (vals(16, 603), vals(4, 604))
  private val (wk, bk) = (vals(16, 605), vals(4, 606))
  private val (wv, bv) = (vals(16, 607), vals(4, 608))
  private val (wf, bf) = (vals(cls * d, 609), vals(cls, 610))

  /** Standard tiled tables, base 100 (10000 is flat over <= 12
    * positions): theta_j = 100^(-j/h); cos[p] = [cos(p·th0),
    * cos(p·th1), cos(p·th0), cos(p·th1)] — both halves share the
    * per-pair frequency, the torch convention. */
  private val cosT = Array.tabulate(maxLen * d) { idx =>
    val (p, j) = (idx / d, idx % d)
    math.cos(p / math.pow(100.0, (j % h).toDouble / h)).toFloat
  }
  private val sinT = Array.tabulate(maxLen * d) { idx =>
    val (p, j) = (idx / d, idx % d)
    math.sin(p / math.pow(100.0, (j % h).toDouble / h)).toFloat
  }

  private val MaxEnd = "9223372036854775807"

  private def ropeLeg(v: String, r: String): String =
    s"""    ${r}1 = torch.slice($v, 2, 0, $h, 1)
       |    ${r}2 = torch.slice($v, 2, $h, $MaxEnd, 1)
       |    n$r = torch.neg(${r}2)
       |    rr$r = torch.cat([n$r, ${r}1], -1)
       |    ${r}c = torch.mul($v, cos)
       |    ${r}s = torch.mul(rr$r, sin)
       |    ${r}r = torch.add(${r}c, ${r}s)""".stripMargin

  private def net(cos: Array[Float], sin: Array[Float],
      body: String): (Module, Map[String, String]) = (
    Module("__torch__.RopeNet", Seq(
      "training" -> B(false),
      "cos" -> Tensor(Seq(maxLen, d), cos),
      "sin" -> Tensor(Seq(maxLen, d), sin),
      "emb" -> Module(EmbeddingCls, Seq(
        "weight" -> Tensor(Seq(vocab, d), ew),
        "padding_idx" -> NoneV,
        "training" -> B(false))),
      "q" -> linear(wq, 4, 4, bq),
      "k" -> linear(wk, 4, 4, bk),
      "v" -> linear(wv, 4, 4, bv),
      "fc" -> linear(wf, cls, 4, bf))),
    Map("code/__torch__.py" ->
      s"""class RopeNet(Module):
         |  training : bool
         |  def forward(self: __torch__.RopeNet,
         |    x: Tensor) -> Tensor:
         |    e = (self.emb).forward(x, )
         |    n = torch.size(e, 1)
         |    q = (self.q).forward(e, )
         |    k = (self.k).forward(e, )
         |    v = (self.v).forward(e, )
         |    cos = torch.slice(self.cos, 0, 0, n, 1)
         |    sin = torch.slice(self.sin, 0, 0, n, 1)
         |$body
         |    kt = torch.transpose(kr, -2, -1)
         |    s = torch.matmul(qr, kt)
         |    s0 = torch.div(s, 2.)
         |    a = torch.softmax(s0, -1)
         |    o = torch.matmul(a, v)
         |    p = torch.mean(o, [1], False, None)
         |    fc = self.fc
         |    return (fc).forward(p, )
         |""".stripMargin))

  private val bothLegs = ropeLeg("q", "q") + "\n" + ropeLeg("k", "k")

  /** Independent f64 forward with RoPE on projected q/k. */
  private def goldenLogits(toks: Array[Int], cos: Array[Float],
      sin: Array[Float]): Array[Double] = {
    val L = toks.length
    val x = Array.tabulate(L, d)((p, j) => ew(toks(p) * d + j).toDouble)
    def proj(w: Array[Float], b: Array[Float]): Array[Array[Double]] =
      Array.tabulate(L, d)((p, o) =>
        b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
    def rope(m: Array[Array[Double]]): Array[Array[Double]] =
      Array.tabulate(L, d) { (p, j) =>
        val c = cos(p * d + j).toDouble
        val s0 = sin(p * d + j).toDouble
        // rotate_half: out_lo = lo*c - hi*s; out_hi = hi*c + lo*s
        if (j < h) m(p)(j) * c - m(p)(h + j) * s0
        else m(p)(j) * c + m(p)(j - h) * s0
      }
    val qm = rope(proj(wq, bq))
    val km = rope(proj(wk, bk))
    val vm = proj(wv, bv)
    val pooled = new Array[Double](d)
    for (a <- 0 until L) {
      val sc = (0 until L).map(b0 =>
        (0 until d).map(j => qm(a)(j) * km(b0)(j)).sum * 0.5)
      val mx = sc.max
      val es = sc.map(s0 => math.exp(s0 - mx))
      val z = es.sum
      for (j <- 0 until d)
        pooled(j) += (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z / L
    }
    mm(pooled, wf, bf, cls, d)
  }

  test("RoPE idiom traces to SelfAttentionOp rope tables; golden vs f64 recompute") {
    val (model, code) = net(cosT, sinT, bothLegs)
    val m = TorchScriptModel.load(writeTemp("rope", "rope", model, code))
    assert(m.ops.map(_.getClass.getSimpleName) ==
      IndexedSeq("EmbeddingSeqOp", "SelfAttentionOp", "SeqMeanPoolOp$",
        "LinearLayer"),
      m.ops.map(_.getClass.getSimpleName).toString)
    val at = m.ops.collectFirst { case a: SelfAttentionOp => a }.get
    assert(at.ropeLen == maxLen && at.ropeCos.get.toSeq == cosT.toSeq &&
      at.ropeSin.get.toSeq == sinT.toSeq)
    assert(!at.causal && at.bias.isEmpty && at.scale == 0.5)
    for (toks <- Seq(Array(3, 0, 6, 2, 5), Array(7, 4, 1), Array(2))) {
      val got = m.forwardTokens(toks)
      val expected = goldenLogits(toks, cosT, sinT)
      for (j <- 0 until cls) assert(math.abs(got(j) - expected(j)) < 1e-5,
        s"toks ${toks.toSeq} logit $j: ${got(j)} vs ${expected(j)}")
    }
    // position count capped by the tables
    val e = intercept[Exception](m.forwardTokens(Array.fill(maxLen + 1)(1)))
    assert(e.getMessage.contains("RoPE tables"), e.getMessage)
  }

  test("identity rotation (cos=1, sin=0) equals plain attention") {
    val ones = Array.fill(maxLen * d)(1f)
    val zeros = Array.fill(maxLen * d)(0f)
    val (model, code) = net(ones, zeros, bothLegs)
    val m = TorchScriptModel.load(writeTemp("ropeid", "ropeid", model, code))
    // plain single-head attention with the same weights
    val plain = new TorchScriptModel(IndexedSeq(
      EmbeddingSeqOp(ew, vocab, d),
      SelfAttentionOp(wq, bq, wk, bk, wv, bv, dim = d, inDim = d, scale = 0.5),
      SeqMeanPoolOp,
      LinearLayer(wf, bf, cls, d)))
    val toks = Array(3, 0, 6, 2, 5, 1)
    val (a, b) = (m.forwardTokens(toks), plain.forwardTokens(toks))
    for (j <- 0 until cls) assert(math.abs(a(j) - b(j)) < 1e-6,
      s"logit $j: ${a(j)} vs ${b(j)}")
  }

  test("misuse fails loudly: one leg rotated, mixed projections, low-half neg, wrong cat order") {
    // only q rotated
    val (m1, c1) = net(cosT, sinT,
      ropeLeg("q", "q") + "\n    kr = k")
    val e1 = intercept[Exception](
      TorchScriptModel.load(writeTemp("rope1", "rope1", m1, c1)))
    assert(e1.getMessage.contains("BOTH q and k"), e1.getMessage)
    // halves from different projections
    val (m2, c2) = net(cosT, sinT,
      s"""    q1 = torch.slice(q, 2, 0, $h, 1)
         |    q2 = torch.slice(k, 2, $h, $MaxEnd, 1)
         |    nq = torch.neg(q2)
         |    rrq = torch.cat([nq, q1], -1)
         |    qc = torch.mul(q, cos)
         |    qs = torch.mul(rrq, sin)
         |    qr = torch.add(qc, qs)
         |""".stripMargin + ropeLeg("k", "k"))
    val e2 = intercept[Exception](
      TorchScriptModel.load(writeTemp("rope2", "rope2", m2, c2)))
    assert(e2.getMessage.contains("different projections"), e2.getMessage)
    // neg of the LOW half is not rotate_half
    val (m3, c3) = net(cosT, sinT,
      s"""    q1 = torch.slice(q, 2, 0, $h, 1)
         |    nq = torch.neg(q1)
         |""".stripMargin + "    qr = q\n    kr = k")
    val e3 = intercept[Exception](
      TorchScriptModel.load(writeTemp("rope3", "rope3", m3, c3)))
    assert(e3.getMessage.contains("high half"), e3.getMessage)
    // cat in the wrong order
    val (m4, c4) = net(cosT, sinT,
      s"""    q1 = torch.slice(q, 2, 0, $h, 1)
         |    q2 = torch.slice(q, 2, $h, $MaxEnd, 1)
         |    nq = torch.neg(q2)
         |    rrq = torch.cat([q1, nq], -1)
         |""".stripMargin + "    qr = q\n    kr = k")
    val e4 = intercept[Exception](
      TorchScriptModel.load(writeTemp("rope4", "rope4", m4, c4)))
    assert(e4.getMessage.contains("rotate_half"), e4.getMessage)
  }

  test("q169 sf0.001: engine argmax == f64 recompute on every doc; gap floor holds") {
    import org.apache.spark.sql.functions._
    val spark = graft.SparkTestSession.spark
    val m = graft.SparkEntry.ropeModel
    val e = m.seqHead.get
    val at = m.ops.collectFirst { case a: SelfAttentionOp => a }.get
    val fc = m.ops.collectFirst { case l: LinearLayer => l }.get
    val E = e.embDim
    val (cosT, sinT) = (at.ropeCos.get, at.ropeSin.get)
    val hh = at.dim / 2

    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q169_torch_rope")(spark, dir).collect()
    assert(rows.length > 0)
    val engine = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap

    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % e.vocab),
          1, 16).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toInt).toArray)
    assert(toks.length == engine.size)

    var minGap = Double.MaxValue
    for ((docId, ids) <- toks) {
      val L = ids.length
      val x = Array.tabulate(L, E)((p, j) => e.weight(ids(p) * E + j).toDouble)
      def proj(w: Array[Float], b: Array[Float]): Array[Array[Double]] =
        Array.tabulate(L, at.dim)((p, o) =>
          b(o) + (0 until E).map(j => x(p)(j) * w(o * E + j)).sum)
      def rope(mm0: Array[Array[Double]]): Array[Array[Double]] =
        Array.tabulate(L, at.dim) { (p, j) =>
          val c = cosT(p * at.dim + j).toDouble
          val s0 = sinT(p * at.dim + j).toDouble
          if (j < hh) mm0(p)(j) * c - mm0(p)(hh + j) * s0
          else mm0(p)(j) * c + mm0(p)(j - hh) * s0
        }
      val qm = rope(proj(at.wq, at.bq))
      val km = rope(proj(at.wk, at.bk))
      val vm = proj(at.wv, at.bv)
      val pooled = new Array[Double](at.dim)
      for (a <- 0 until L) {
        val lim = a + 1 // causal prefix
        val sc = (0 until lim).map(b0 =>
          (0 until at.dim).map(j => qm(a)(j) * km(b0)(j)).sum * at.scale)
        val mx = sc.max
        val es = sc.map(s0 => math.exp(s0 - mx))
        val z = es.sum
        for (j <- 0 until at.dim)
          pooled(j) += (0 until lim).map(b0 => es(b0) * vm(b0)(j)).sum / z / L
      }
      val logits = Array.tabulate(fc.outDim) { o =>
        fc.bias(o) + (0 until fc.inDim).map(j => pooled(j) * fc.weight(o * fc.inDim + j)).sum
      }
      val best = logits.indices.maxBy(logits)
      assert(engine(docId) == best,
        s"doc $docId: engine ${engine(docId)} vs f64 argmax $best (${logits.toSeq})")
      val sorted = logits.sorted.reverse
      minGap = math.min(minGap, sorted(0) - sorted(1))
    }
    // rotation + one attention head + fc accumulate f32-rounding drift
    // << 1e-4; the fixture's runner-up gap clears it comfortably
    assert(minGap > 1e-4, s"argmax gap floor violated: $minGap")
  }
}
