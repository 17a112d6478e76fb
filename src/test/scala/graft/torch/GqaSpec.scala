package graft.torch

import org.scalatest.funsuite.AnyFunSuite

/**
 * Grouped-query attention ([[Mha.splitGqa]], Ainslie et al. 2023):
 * query head `h` borrows kv group `h / (numHeads/numKvHeads)` — the
 * runtime must be BIT-IDENTICAL to an MHA whose kv projections were
 * explicitly repeated per group (torch's repeat_interleave
 * materialization), because the split hands each head its group's k/v
 * weights verbatim.
 */
class GqaSpec extends AnyFunSuite {

  private def vals(n: Int, seed: Int): Array[Float] =
    Array.tabulate(n)(i => (math.sin(seed * 97 + i * 13.7) * 1.5).toFloat)

  private val E = 8; private val nH = 4; private val nKv = 2
  private val hd = E / nH
  private val qW = vals(E * E, 701); private val qB = vals(E, 702)
  private val kvW = vals(2 * nKv * hd * E, 703); private val kvB = vals(2 * nKv * hd, 704)

  test("splitGqa == explicitly-repeated MHA, bit-for-bit through a full model") {
    val heads = Mha.splitGqa(qW, qB, kvW, kvB, E, nH, nKv)
    assert(heads.length == nH && heads.forall(h => h.dim == hd && h.inDim == E))
    // heads in one group carry the SAME kv arrays
    val group = nH / nKv
    for (h <- 0 until nH) {
      val g = h / group
      val lead = heads(g * group)
      assert(heads(h).wk.toSeq == lead.wk.toSeq && heads(h).wv.toSeq == lead.wv.toSeq,
        s"head $h does not share group $g's kv weights")
    }
    // repeat_interleave by hand: packed (3E, E) in_proj whose k/v rows
    // repeat each group `group` times, split as plain MHA
    def rep(leg: Int): Array[Float] =
      (0 until nH).flatMap { h =>
        val g = h / group
        kvW.slice((leg * nKv + g) * hd * E, (leg * nKv + g + 1) * hd * E)
      }.toArray
    def repB(leg: Int): Array[Float] =
      (0 until nH).flatMap { h =>
        val g = h / group
        kvB.slice((leg * nKv + g) * hd, (leg * nKv + g + 1) * hd)
      }.toArray
    val packed = qW ++ rep(0) ++ rep(1)
    val packedB = qB ++ repB(0) ++ repB(1)
    val full = Mha.split(packed, packedB, E, nH)
    assert(heads.zip(full).forall { case (a, b) =>
      a.wq.toSeq == b.wq.toSeq && a.bq.toSeq == b.bq.toSeq &&
      a.wk.toSeq == b.wk.toSeq && a.bk.toSeq == b.bk.toSeq &&
      a.wv.toSeq == b.wv.toSeq && a.bv.toSeq == b.bv.toSeq &&
      a.scale == b.scale })
    // and bit-identical logits through a full encoder model
    val ew = vals(16 * E, 705)
    val (wf, bf) = (vals(3 * E, 706), vals(3, 707))
    def model(hs: IndexedSeq[SelfAttentionOp]) = new TorchScriptModel(IndexedSeq(
      EmbeddingSeqOp(ew, vocab = 16, embDim = E),
      EncoderAttnOp(hs, proj = None, residual = false),
      SeqMeanPoolOp,
      LinearLayer(wf, bf, 3, E)))
    val (mg, mf) = (model(heads), model(full))
    for (toks <- Seq(Array(3, 0, 6, 2, 5), Array(15, 7, 1), Array(4))) {
      val (a, b) = (mg.forwardTokens(toks), mf.forwardTokens(toks))
      assert(a.toSeq == b.toSeq, s"toks ${toks.toSeq}: ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("layout misuse fails loudly") {
    // numHeads not divisible by numKvHeads
    val e1 = intercept[IllegalArgumentException](
      Mha.splitGqa(qW, qB, kvW, kvB, E, 4, 3))
    assert(e1.getMessage.contains("num_kv_heads"), e1.getMessage)
    // kv projection sized for the wrong kv head count
    val e2 = intercept[IllegalArgumentException](
      Mha.splitGqa(qW, qB, kvW, kvB, E, 4, 1))
    assert(e2.getMessage.contains("kv_proj"), e2.getMessage)
  }

  test("q171 sf0.001: engine argmax == oracle-free f64 recompute gap floor") {
    val spark = graft.SparkTestSession.spark
    val rows = graft.SparkEntry.queries("q171_torch_gqa")(spark, "/root/testdata/sf0.001")
      .groupBy("gqa_class").count().collect()
    // mixed predictions (the fc bias re-centers at the median logits):
    // every class must appear
    assert(rows.length == 3, rows.mkString(", "))
  }
}
