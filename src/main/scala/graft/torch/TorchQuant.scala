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

  /** Dequantized int8 projection of one weight tensor. */
  def int8Dequant(w: Array[Float]): Array[Float] = {
    var maxAbs = 0.0f
    var i = 0
    while (i < w.length) {
      val a = math.abs(w(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs == 0.0f) w.clone()
    else {
      val s = maxAbs / 127.0f
      w.map { v =>
        val q = math.round(v / s).toInt // int8 code in [-127, 127]
        q * s
      }
    }
  }

  private def quantLinear(l: LinearLayer): LinearLayer =
    l.copy(weight = int8Dequant(l.weight))

  /** The model with every matmul weight pushed onto the int8 grid. */
  def quantizeInt8(m: TorchScriptModel): TorchScriptModel = {
    val ops = m.ops.map {
      case l: LinearLayer => quantLinear(l)
      case a: SelfAttentionOp => a.copy(
        wq = int8Dequant(a.wq), wk = int8Dequant(a.wk), wv = int8Dequant(a.wv))
      case ea: EncoderAttnOp => ea.copy(
        heads = ea.heads.map(h => h.copy(
          wq = int8Dequant(h.wq), wk = int8Dequant(h.wk), wv = int8Dequant(h.wv))),
        proj = ea.proj.map(quantLinear))
      case f: PosFfnOp => f.copy(l1 = quantLinear(f.l1), l2 = quantLinear(f.l2))
      case other => other
    }
    new TorchScriptModel(ops)
  }
}
