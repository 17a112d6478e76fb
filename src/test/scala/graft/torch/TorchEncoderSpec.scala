package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q127's numerical-safety contract on real fixture data: the engine's
  * per-op-rounded encoder block (attention f32 boundary -> LN -> FFN ->
  * LN -> pool -> fc) must agree with an independent all-f64 recompute
  * on EVERY document's argmax, with the f64 runner-up gap clearing the
  * accumulated rounding drift (~1e-6) by orders of magnitude. */
class TorchEncoderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** All-f64 recompute of the mean-pooled encoder block (attention ->
    * LN -> FFN -> LN -> mean pool -> fc) for one token sequence —
    * shared by the q127 check, the q145 cross-encoder check, and the
    * bias-tuning harnesses. */
  private[torch] def encLogitsF64(m: TorchScriptModel, ids: Array[Int]): Array[Double] = {
    val e = m.seqHead.get
    val ea = m.ops.collectFirst { case a: EncoderAttnOp => a }.get
    val lns = m.ops.collect { case l: SeqLayerNormOp => l }
    val ff = m.ops.collectFirst { case f: PosFfnOp => f }.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val d = ea.inDim
    val L = ids.length
    val x = Array.tabulate(L, d)((p, j) => e.weight(ids(p) * e.embDim + j).toDouble)
    def headOut(h: SelfAttentionOp): Array[Array[Double]] = {
      val hd = h.dim
      def pr(w: Array[Float], b: Array[Float]) = Array.tabulate(L, hd)((p, o) =>
        b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
      val (qm, km, vm) = (pr(h.wq, h.bq), pr(h.wk, h.bk), pr(h.wv, h.bv))
      Array.tabulate(L) { a =>
        val sc = Array.tabulate(L)(b0 =>
          (0 until hd).map(j => qm(a)(j) * km(b0)(j)).sum * h.scale)
        val mx = sc.max
        val es = sc.map(s0 => math.exp(s0 - mx))
        val z = es.sum
        Array.tabulate(hd)(j => (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z)
      }
    }
    val heads = ea.heads.map(headOut)
    val pl = ea.proj.get
    def lnF(y: Array[Double], ln: SeqLayerNormOp): Array[Double] = {
      val mean = y.sum / d
      val va = y.map(v => (v - mean) * (v - mean)).sum / d
      val inv = 1.0 / math.sqrt(va + ln.eps)
      Array.tabulate(d)(j => (y(j) - mean) * inv * ln.gamma(j) + ln.beta(j))
    }
    val pooled = new Array[Double](d)
    for (p <- 0 until L) {
      val cat = heads.flatMap(ho => ho(p)).toArray
      val pj = Array.tabulate(d)(o =>
        pl.bias(o) + (0 until d).map(j => cat(j) * pl.weight(o * d + j)).sum)
      val n1 = lnF(Array.tabulate(d)(j => x(p)(j) + pj(j)), lns(0))
      val hid = ff.l1.outDim
      val mid = Array.tabulate(hid)(h =>
        math.max(0.0, ff.l1.bias(h) + (0 until d).map(j => n1(j) * ff.l1.weight(h * d + j)).sum))
      val f2 = Array.tabulate(d)(o =>
        ff.l2.bias(o) + (0 until hid).map(h => mid(h) * ff.l2.weight(o * hid + h)).sum)
      val n2 = lnF(Array.tabulate(d)(j => n1(j) + f2(j)), lns(1))
      for (j <- 0 until d) pooled(j) += n2(j) / L
    }
    Array.tabulate(fc.outDim)(o =>
      fc.bias(o) + (0 until d).map(j => pooled(j) * fc.weight(o * d + j)).sum)
  }

  test("sf0.001: engine argmax == f64 encoder recompute on every doc; gap floor holds") {
    val m = graft.SparkEntry.encModel
    val e = m.seqHead.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last

    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q127_torch_encoder")(spark, dir).collect()
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
      val logits = encLogitsF64(m, ids)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"argmax gap floor violated: $minGap")
  }

  test("sf0.001 MHA block: engine argmax == f64 recompute (packed-split heads); gap floor holds") {
    val m = graft.SparkEntry.mhaModel
    val e = m.seqHead.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q147_torch_mha")(spark, dir).collect()
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
      val logits = encLogitsF64(m, ids)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"MHA argmax gap floor violated: $minGap")
  }

  test("sf0.001 cross-encoder: engine ce_class == f64 pair-text recompute; gap floor holds") {
    // q145 runs encModel over PAIR texts ('spark join dup ' + doc) for
    // the BM25 top-20 — a different input distribution than q127, so
    // the argmax margin is pinned separately (measured min gap 0.035 /
    // 0.040 / 0.084 at sf0.001/0.01/0.1; floor 1e-2 is 3x under the
    // weakest measurement and >1000x the f32-boundary drift).
    val m = graft.SparkEntry.encModel
    val e = m.seqHead.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q145_cross_encoder")(spark, dir).collect()
    assert(rows.length > 0 && rows.length <= 20)
    // ce_rank is a permutation of 1..n and ordered
    assert(rows.map(_.getInt(3)).toSeq == (1 to rows.length))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    var minGap = Double.MaxValue
    for (r <- rows) {
      val (docId, cls) = (r.getLong(0), r.getInt(2))
      val words = graft.Tok.Pattern.r
        .findAllIn("spark join dup " + docs(docId)).take(12).toArray
      val ids = words.map { w =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        val hex = md.take(4).map(b => f"$b%02x").mkString
        (java.lang.Long.parseLong(hex, 16) % e.vocab).toInt
      }
      val logits = encLogitsF64(m, ids)
      assert(logits.indexOf(logits.max) == cls,
        s"doc $docId: engine $cls vs f64 ${logits.indexOf(logits.max)}")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-2, s"cross-encoder argmax gap floor violated: $minGap")
  }

  test("sf0.001 CLS head: engine argmax == f64 recompute (pos-embed + CLS pool); gap floor holds") {
    val m = graft.SparkEntry.encClsModel
    val e = m.seqHead.get
    val pe = m.ops.collectFirst { case p: PosEmbedOp => p }.get
    val ea = m.ops.collectFirst { case a: EncoderAttnOp => a }.get
    val lns = m.ops.collect { case l: SeqLayerNormOp => l }
    val ff = m.ops.collectFirst { case f: PosFfnOp => f }.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val d = ea.inDim

    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q136_torch_cls")(spark, dir).collect()
    assert(rows.length > 0)
    val engine = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap

    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % e.vocab),
          1, 11).as("word_ids"))
      .filter(size(col("word_ids")) >= 1)
      .collect()
      .map(r => r.getLong(0) -> (0 +: r.getSeq[Long](1).map(_.toInt)).toArray)
    assert(toks.length == engine.size)

    var minGap = Double.MaxValue
    for ((docId, ids) <- toks) {
      val L = ids.length
      // token + position embedding, rounded to f32 once (the engine's
      // PosEmbedOp boundary), then f64 throughout
      val x = Array.tabulate(L, d)((p, j) =>
        (e.weight(ids(p) * e.embDim + j).toDouble + pe.weight(p * d + j)).toFloat.toDouble)
      def headOut(h: SelfAttentionOp): Array[Array[Double]] = {
        val hd = h.dim
        def pr(w: Array[Float], b: Array[Float]) = Array.tabulate(L, hd)((p, o) =>
          b(o) + (0 until d).map(j => x(p)(j) * w(o * d + j)).sum)
        val (qm, km, vm) = (pr(h.wq, h.bq), pr(h.wk, h.bk), pr(h.wv, h.bv))
        Array.tabulate(L) { a =>
          val sc = Array.tabulate(L)(b0 =>
            (0 until hd).map(j => qm(a)(j) * km(b0)(j)).sum * h.scale)
          val mx = sc.max
          val es = sc.map(s0 => math.exp(s0 - mx))
          val z = es.sum
          Array.tabulate(hd)(j => (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z)
        }
      }
      val heads = ea.heads.map(headOut)
      val pl = ea.proj.get
      def lnF(y: Array[Double], ln: SeqLayerNormOp): Array[Double] = {
        val mean = y.sum / d
        val va = y.map(v => (v - mean) * (v - mean)).sum / d
        val inv = 1.0 / math.sqrt(va + ln.eps)
        Array.tabulate(d)(j => (y(j) - mean) * inv * ln.gamma(j) + ln.beta(j))
      }
      // CLS read-out: only position 0 reaches the classifier
      val p = 0
      val cat = heads.flatMap(ho => ho(p)).toArray
      val pj = Array.tabulate(d)(o =>
        pl.bias(o) + (0 until d).map(j => cat(j) * pl.weight(o * d + j)).sum)
      val n1 = lnF(Array.tabulate(d)(j => x(p)(j) + pj(j)), lns(0))
      val hid = ff.l1.outDim
      val mid = Array.tabulate(hid)(h =>
        math.max(0.0, ff.l1.bias(h) + (0 until d).map(j => n1(j) * ff.l1.weight(h * d + j)).sum))
      val f2 = Array.tabulate(d)(o =>
        ff.l2.bias(o) + (0 until hid).map(h => mid(h) * ff.l2.weight(o * hid + h)).sum)
      val cls0 = lnF(Array.tabulate(d)(j => n1(j) + f2(j)), lns(1))
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until d).map(j => cls0(j) * fc.weight(o * d + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    // measured 1.5e-2 over sf0.001+sf0.01 (dyadic-grid bias search)
    assert(minGap > 1e-2, s"CLS argmax gap floor violated: $minGap")
  }
}
