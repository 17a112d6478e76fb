package graft.torch

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * LoRA adapter folding (q204): `W + (α/r)·B·A` merged at load must be
 * BIT-IDENTICAL to an explicitly-summed dense model (the
 * GQA-vs-repeated-MHA recipe), a zero-B adapter must be an exact
 * no-op, per-head B row slices must equal the full-matrix fold +
 * re-split, dangling targets must fail loudly, and the merged
 * classifier's argmax must clear its runner-up gap floor on every
 * sf0.001 doc against an all-f64 recompute.
 */
class LoraSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def vals(n: Int, seed: Int): Array[Float] =
    Array.tabulate(n)(i =>
      (math.round(math.sin(seed * 97 + i * 13.7) * 8) / 16.0).toFloat)

  test("merged model == explicitly-summed dense model, bit-identical weights and outputs") {
    val base = graft.SparkEntry.encModel
    val d = graft.torch.Lora.Delta(vals(2 * 4, 11), vals(3 * 2, 13), rank = 2, alpha = 2.0)
    val merged = Lora.merge(base, Map("fc:0" -> d))
    // the explicit dense sum: same f64 accumulation, one f32 rounding
    val fc = base.ops.collectFirst { case l: LinearLayer => l }.get
    val s = d.alpha / d.rank
    val dense = fc.copy(weight = Array.tabulate(fc.weight.length) { i =>
      val o = i / fc.inDim
      val j = i % fc.inDim
      val ba = (0 until d.rank).map(r =>
        d.b(o * d.rank + r).toDouble * d.a(r * fc.inDim + j).toDouble).sum
      (fc.weight(i).toDouble + s * ba).toFloat
    })
    val mergedFc = merged.ops.collectFirst { case l: LinearLayer => l }.get
    assert(mergedFc.weight.toSeq == dense.weight.toSeq)
    assert(mergedFc.bias.toSeq == fc.bias.toSeq, "LoRA never touches biases")
    // and the models agree bit-exactly end to end
    val denseModel = new TorchScriptModel(
      base.ops.map { case l: LinearLayer => dense; case o => o })
    for (t <- Seq(Array(3, 0, 6, 2, 5, 1), Array(7, 4, 2), Array(5)))
      assert(merged.forwardTokens(t).toSeq == denseModel.forwardTokens(t).toSeq)
  }

  test("per-head B row slices == full-matrix fold + Mha re-split") {
    val E = 4
    val base = graft.SparkEntry.encModel
    val ea = base.ops.collectFirst { case a: EncoderAttnOp => a }.get
    val d = graft.torch.Lora.Delta(vals(2 * E, 17), vals(ea.catDim * 2, 19),
      rank = 2, alpha = 2.0)
    val merged = Lora.merge(base, Map("attn:0:q" -> d))
    val mea = merged.ops.collectFirst { case a: EncoderAttnOp => a }.get
    // reconstitute the full (catDim, E) Wq, fold it whole, then slice
    var off = 0
    val sc = d.alpha / d.rank
    for ((h, mh) <- ea.heads.zip(mea.heads)) {
      val expect = Array.tabulate(h.wq.length) { i =>
        val o = i / E
        val j = i % E
        val ba = (0 until d.rank).map(r =>
          d.b((off + o) * d.rank + r).toDouble * d.a(r * E + j).toDouble).sum
        (h.wq(i).toDouble + sc * ba).toFloat
      }
      assert(mh.wq.toSeq == expect.toSeq, s"head at row offset $off")
      assert(mh.wk.toSeq == h.wk.toSeq && mh.wv.toSeq == h.wv.toSeq,
        "untargeted projections unchanged")
      off += h.dim
    }
  }

  test("zero-B adapter (the real init) is an exact no-op; dangling targets fail loudly") {
    val base = graft.SparkEntry.encModel
    val zero = graft.torch.Lora.Delta(vals(2 * 4, 23), new Array[Float](3 * 2),
      rank = 2, alpha = 16.0)
    val merged = Lora.merge(base, Map("fc:0" -> zero))
    for (t <- Seq(Array(3, 0, 6, 2), Array(7)))
      assert(merged.forwardTokens(t).toSeq == base.forwardTokens(t).toSeq)
    val err = intercept[IllegalArgumentException] {
      Lora.merge(base, Map("fc:7" -> zero))
    }
    assert(err.getMessage.contains("matched nothing"), err.getMessage)
    val err2 = intercept[Exception] {
      Lora.merge(base, Map("attn:0:q" -> graft.torch.Lora.Delta(
        vals(2 * 5, 29), vals(4 * 2, 31), rank = 2, alpha = 2.0)))
    }
    assert(err2.getMessage.contains("expected rank"), err2.getMessage)
  }

  test("sf0.001: q204 engine argmax == f64 recompute on every doc; gap floor holds") {
    val m = graft.SparkEntry.loraEncModel
    val e = m.seqHead.get
    val fc = m.ops.collect { case l: LinearLayer => l }.last
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q204_torch_lora")(spark, dir).collect()
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
    val helper = new TorchEncoderSpec
    var minGap = Double.MaxValue
    for ((docId, ids) <- toks) {
      val logits = helper.encLogitsF64(m, ids)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    info(s"q204 min runner-up gap at sf0.001: $minGap")
    assert(minGap > 1e-3, s"LoRA argmax gap floor violated: $minGap")
  }
}
