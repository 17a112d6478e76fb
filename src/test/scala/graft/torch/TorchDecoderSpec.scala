package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q138/q139's numerical-safety contract on real fixture data: the
  * engine's per-op-rounded CAUSAL attention chains must agree with an
  * independent all-f64 recompute on EVERY document's argmax, with the
  * f64 runner-up gap clearing the accumulated rounding drift (~1e-6;
  * for q139 also the f32 rounding of the non-dyadic sinusoidal
  * position sum) by orders of magnitude. The recompute restates the
  * causal mask as a hard prefix bound — exactly what the additive
  * -inf mask produces — so an engine regression that attended past
  * the diagonal would flip argmaxes here. */
class TorchDecoderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Causal single-head attention rows in f64: row a pools over
    * positions 0..a only. */
  private def causalHead(h: SelfAttentionOp, x: Array[Array[Double]],
      d: Int): Array[Array[Double]] = {
    val L = x.length
    val hd = h.dim
    def pr(w: Array[Float], b: Array[Float]) = Array.tabulate(L, hd)((p, o) =>
      b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
    val (qm, km, vm) = (pr(h.wq, h.bq), pr(h.wk, h.bk), pr(h.wv, h.bv))
    Array.tabulate(L) { a =>
      val lim = if (h.causal) a + 1 else L
      val sc = Array.tabulate(lim)(b0 =>
        (0 until hd).map(j => qm(a)(j) * km(b0)(j)).sum * h.scale)
      val mx = sc.max
      val es = sc.map(s0 => math.exp(s0 - mx))
      val z = es.sum
      Array.tabulate(hd)(j => (0 until lim).map(b0 => es(b0) * vm(b0)(j)).sum / z)
    }
  }

  test("sf0.001 decoder: engine argmax == f64 causal-block recompute; gap floor holds") {
    val m = graft.SparkEntry.decModel
    val e = m.seqHead.get
    val pe = m.ops.collectFirst { case p: PosEmbedOp => p }.get
    val ea = m.ops.collectFirst { case a: EncoderAttnOp => a }.get
    val lns = m.ops.collect { case l: SeqLayerNormOp => l }
    val ff = m.ops.collectFirst { case f: PosFfnOp => f }.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val d = ea.inDim
    assert(ea.heads.forall(_.causal))

    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q138_torch_decoder")(spark, dir).collect()
    assert(rows.length > 0)
    val engine = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap

    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % e.vocab),
          1, 12).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toInt).toArray)
    assert(toks.length == engine.size)

    var minGap = Double.MaxValue
    for ((docId, ids) <- toks) {
      val L = ids.length
      // token + position embedding, rounded to f32 once (the engine's
      // PosEmbedOp boundary), then f64 throughout
      val x = Array.tabulate(L, d)((p, j) =>
        (e.weight(ids(p) * e.embDim + j).toDouble + pe.weight(p * d + j)).toFloat.toDouble)
      val heads = ea.heads.map(h => causalHead(h, x, d))
      val pl = ea.proj.get
      def lnF(y: Array[Double], ln: SeqLayerNormOp): Array[Double] = {
        val mean = y.sum / d
        val va = y.map(v => (v - mean) * (v - mean)).sum / d
        val inv = 1.0 / math.sqrt(va + ln.eps)
        Array.tabulate(d)(j => (y(j) - mean) * inv * ln.gamma(j) + ln.beta(j))
      }
      // last-token read-out: only position L-1 reaches the classifier
      val lastVec = {
        val p = L - 1
        val cat = heads.flatMap(ho => ho(p)).toArray
        val pj = Array.tabulate(d)(o =>
          pl.bias(o) + (0 until d).map(j => cat(j) * pl.weight(o * d + j)).sum)
        val n1 = lnF(Array.tabulate(d)(j => x(p)(j) + pj(j)), lns(0))
        val hid = ff.l1.outDim
        val mid = Array.tabulate(hid)(h =>
          math.max(0.0, ff.l1.bias(h) + (0 until d).map(j => n1(j) * ff.l1.weight(h * d + j)).sum))
        val f2 = Array.tabulate(d)(o =>
          ff.l2.bias(o) + (0 until hid).map(h => mid(h) * ff.l2.weight(o * hid + h)).sum)
        lnF(Array.tabulate(d)(j => n1(j) + f2(j)), lns(1))
      }
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until d).map(j => lastVec(j) * fc.weight(o * d + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"argmax gap floor violated: $minGap")
  }

  test("sf0.001 sinusoidal PE: engine argmax == f64 recompute; gap floor holds") {
    val m = graft.SparkEntry.sinPeModel
    val e = m.seqHead.get
    val pe = m.ops.collectFirst { case p: PosEmbedOp => p }.get
    val at = m.ops.collectFirst { case a: SelfAttentionOp => a }.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val d = at.inDim
    assert(at.causal)
    // the PE buffer really is the sinusoidal formula (f32-rounded)
    for (p <- 0 until pe.maxLen; j <- 0 until d) {
      val angle = p / math.pow(100.0, (2 * (j / 2)).toDouble / d)
      val want = (if (j % 2 == 0) math.sin(angle) else math.cos(angle)).toFloat
      assert(pe.weight(p * d + j) == want, s"pe($p, $j)")
    }

    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q139_torch_sinpe")(spark, dir).collect()
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
      val x = Array.tabulate(L, d)((p, j) =>
        (e.weight(ids(p) * e.embDim + j).toDouble + pe.weight(p * d + j)).toFloat.toDouble)
      val att = causalHead(at, x, d)
      val pooled = Array.tabulate(d)(j => (0 until L).map(p => att(p)(j)).sum / L)
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until d).map(j => pooled(j) * fc.weight(o * d + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"argmax gap floor violated: $minGap")
  }
}
