package graft.torch

/**
 * Post-training int8 quantization (symmetric, per-tensor) of a parsed
 * TorchScript model — the standard W8 scheme: every MATMUL weight
 * tensor (attention q/k/v projections, the attention output
 * projection, FFN linears, the classifier) maps to
 * `dequant(round(w / s)) · s` with `s = maxabs(w) / 127`; biases,
 * embeddings, position tables and LayerNorm parameters stay fp32
 * (quantizing them buys nothing — they are O(dim), not O(dim²)).
 *
 * The result is a REGULAR TorchScriptModel over the dequantized
 * weights, so the whole inference stack (batched GEMM executor, SQL
 * oracle generator) runs it unchanged — quantization error becomes an
 * ordinary weight perturbation whose effect the q198 agreement query
 * measures. Deterministic: round-half-away on the f32 ratio, scale in
 * f32, no RNG anywhere.
 */
object TorchQuant {

  /** Dequantized symmetric projection of one weight tensor onto the
    * `[-maxCode, maxCode]` grid (127 = int8, 7 = int4). */
  def dequantGrid(w: Array[Float], maxCode: Int): Array[Float] = {
    var maxAbs = 0.0f
    var i = 0
    while (i < w.length) {
      val a = math.abs(w(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs == 0.0f) w.clone()
    else {
      val s = maxAbs / maxCode.toFloat
      w.map { v =>
        val q = math.round(v / s).toInt // code in [-maxCode, maxCode]
        q * s
      }
    }
  }

  /** Dequantized int8 projection of one weight tensor. */
  def int8Dequant(w: Array[Float]): Array[Float] = dequantGrid(w, 127)

  /** The model with every matmul weight pushed onto the given grid —
    * maxCode 127 = W8 PTQ; maxCode 7 = the int4 DRAFT-model recipe
    * (speculative decoding with a compressed draft, q199). */
  def quantize(m: TorchScriptModel, maxCode: Int): TorchScriptModel = {
    def quantLinear(l: LinearLayer): LinearLayer =
      l.copy(weight = dequantGrid(l.weight, maxCode))
    def int8Dequant(w: Array[Float]): Array[Float] = dequantGrid(w, maxCode)
    quantizeBy(m, quantLinear, int8Dequant)
  }

  /** [[quantize]] at int8. */
  def quantizeInt8(m: TorchScriptModel): TorchScriptModel = quantize(m, 127)

  private def quantizeBy(m: TorchScriptModel,
      quantLinear: LinearLayer => LinearLayer,
      int8Dequant: Array[Float] => Array[Float]): TorchScriptModel = {
    def quantOp(op: TorchOp): TorchOp = op match {
      case l: LinearLayer => quantLinear(l)
      case a: SelfAttentionOp => a.copy(
        wq = int8Dequant(a.wq), wk = int8Dequant(a.wk), wv = int8Dequant(a.wv))
      case ea: EncoderAttnOp => ea.copy(
        heads = ea.heads.map(h => h.copy(
          wq = int8Dequant(h.wq), wk = int8Dequant(h.wk), wv = int8Dequant(h.wv))),
        proj = ea.proj.map(quantLinear))
      case ca: CrossAttnOp => ca.copy(
        heads = ca.heads.map(h => h.copy(
          wq = int8Dequant(h.wq), wk = int8Dequant(h.wk), wv = int8Dequant(h.wv))),
        proj = ca.proj.map(quantLinear))
      case f: PosFfnOp => f.copy(l1 = quantLinear(f.l1), l2 = quantLinear(f.l2))
      case other => other
    }
    // the encoder leg of a cross-attention model quantizes too
    new TorchScriptModel(m.ops.map(quantOp), m.encOps.map(quantOp))
  }
}
