package graft.torch

/**
 * LoRA adapter folding (Hu et al. 2021): a low-rank delta
 * `ΔW = (α/r)·B·A` (B `(out, r)`, A `(r, in)`) merged into a base
 * weight at LOAD time — `W' = W + ΔW` — so the merged model runs at
 * exactly the dense model's cost. This is the ubiquitous post-training
 * deployment shape (the reference would run the already-merged
 * TorchScript via libtorch, reference src/udf.rs:127; here the merge
 * itself is part of the loader surface).
 *
 * Numerics: ΔW accumulates in f64 from the f32 factors and folds with
 * ONE f32 rounding per weight value — so a merged model is
 * BIT-IDENTICAL to a dense model whose weights were explicitly summed
 * the same way (LoraSpec pins this, the GQA-vs-repeated-MHA recipe),
 * and a zero B (how real adapters initialize) is an exact no-op.
 *
 * Targets address ops the way the op list orders them:
 *  - `fc:<k>`         — the k-th top-level [[LinearLayer]] (0-based)
 *  - `ffn:<k>:l1|l2`  — the k-th [[PosFfnOp]]'s projections
 *  - `attn:<k>:q|k|v` — the k-th [[EncoderAttnOp]]'s FULL `(Σ head
 *    dims, E)` projection: head `i` owns rows `[i·hd, (i+1)·hd)` of B
 *    (exactly the packed layout [[Mha.split]] slices), so the fold
 *    happens per head on B's row slice — bit-equal to folding the
 *    reconstituted full matrix and re-splitting
 *  - `attn:<k>:out`   — that op's out-projection
 * Unknown / unconsumed targets fail loudly (a dangling adapter key is
 * a wrong-model mistake, never a silent no-op).
 */
object Lora {

  /** One adapter: `a` row-major `(rank, in)`, `b` row-major
    * `(out, rank)`, scaling `alpha / rank`. */
  final case class Delta(a: Array[Float], b: Array[Float], rank: Int, alpha: Double) {
    require(rank >= 1, s"rank $rank must be >= 1")
  }

  /** `W + (α/r)·B·A` over the `(out, in)` row-major weight, f64
    * accumulation, one f32 rounding per value. `bRow0` offsets into
    * B's rows (per-head slices of a packed projection). */
  private def fold(w: Array[Float], out: Int, in: Int, d: Delta,
      bRows: Int, bRow0: Int): Array[Float] = {
    require(d.a.length == d.rank * in,
      s"LoRA A is ${d.a.length} values, expected rank ${d.rank} x in $in")
    require(d.b.length == bRows * d.rank,
      s"LoRA B is ${d.b.length} values, expected out $bRows x rank ${d.rank}")
    require(bRow0 + out <= bRows, s"B row slice [$bRow0, ${bRow0 + out}) outside $bRows")
    val s = d.alpha / d.rank
    val res = new Array[Float](w.length)
    var o = 0
    while (o < out) {
      var j = 0
      while (j < in) {
        var acc = 0.0
        var r = 0
        while (r < d.rank) {
          acc += d.b((bRow0 + o) * d.rank + r).toDouble * d.a(r * in + j).toDouble
          r += 1
        }
        res(o * in + j) = (w(o * in + j).toDouble + s * acc).toFloat
        j += 1
      }
      o += 1
    }
    res
  }

  private def foldLinear(l: LinearLayer, d: Delta): LinearLayer =
    l.copy(weight = fold(l.weight, l.outDim, l.inDim, d, l.outDim, 0))

  /** Merge adapters into the base model's op list. Every key in
    * `deltas` must match a target; the result is a plain dense model
    * (no runtime adapter indirection — the 100 TB deployment shape). */
  def merge(m: TorchScriptModel, deltas: Map[String, Delta]): TorchScriptModel = {
    val consumed = scala.collection.mutable.Set.empty[String]
    def take(key: String): Option[Delta] = {
      val d = deltas.get(key)
      if (d.isDefined) consumed += key
      d
    }
    var linK = -1
    var ffnK = -1
    var attnK = -1
    val ops2 = m.ops.map {
      case l: LinearLayer =>
        linK += 1
        take(s"fc:$linK").map(foldLinear(l, _)).getOrElse(l)
      case f: PosFfnOp =>
        ffnK += 1
        val l1 = take(s"ffn:$ffnK:l1").map(foldLinear(f.l1, _)).getOrElse(f.l1)
        val l2 = take(s"ffn:$ffnK:l2").map(foldLinear(f.l2, _)).getOrElse(f.l2)
        if ((l1 eq f.l1) && (l2 eq f.l2)) f else f.copy(l1 = l1, l2 = l2)
      case ea: EncoderAttnOp =>
        attnK += 1
        val dq = take(s"attn:$attnK:q")
        val dk = take(s"attn:$attnK:k")
        val dv = take(s"attn:$attnK:v")
        val dOut = take(s"attn:$attnK:out")
        if (dq.isEmpty && dk.isEmpty && dv.isEmpty && dOut.isEmpty) ea
        else {
          // head i owns rows [off, off + h.dim) of the packed (catDim, E)
          // projection — fold its slice of B against the shared A
          var off = 0
          val heads2 = ea.heads.map { h =>
            val h2 = h.copy(
              wq = dq.map(fold(h.wq, h.dim, h.inDim, _, ea.catDim, off)).getOrElse(h.wq),
              wk = dk.map(fold(h.wk, h.dim, h.inDim, _, ea.catDim, off)).getOrElse(h.wk),
              wv = dv.map(fold(h.wv, h.dim, h.inDim, _, ea.catDim, off)).getOrElse(h.wv))
            off += h.dim
            h2
          }
          val proj2 = (ea.proj, dOut) match {
            case (Some(p), Some(d)) => Some(foldLinear(p, d))
            case (None, Some(_)) =>
              sys.error(s"attn:$attnK:out targeted but the op has no out-projection")
            case (p, None) => p
          }
          ea.copy(heads = heads2, proj = proj2)
        }
      case other => other
    }
    val dangling = deltas.keySet -- consumed
    require(dangling.isEmpty,
      s"LoRA targets matched nothing in the model: ${dangling.toSeq.sorted.mkString(", ")}")
    new TorchScriptModel(ops2, m.encOps)
  }
}
