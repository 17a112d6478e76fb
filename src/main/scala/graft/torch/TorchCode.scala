package graft.torch

import scala.collection.mutable

/**
 * Interpreter for the serialized `forward()` code inside a TorchScript
 * archive (`code/__torch__.py` and the per-class files under `code/`).
 *
 * Why this exists: module REGISTRATION order does not determine
 * EXECUTION order. The reference's own model registers one shared ReLU
 * after all three Linears (`/root/reference/model/iris.spt` →
 * `code/__torch__.py`: attrs `input_layer, hidden_layer1, output_layer,
 * relu`, while `forward` applies `relu` twice, between the linears), so
 * any heuristic over the state-dict order is a guess. TorchScript,
 * however, ships the true execution order as generated straight-line code:
 *
 * {{{
 * def forward(self: __torch__.IRISClassificationModel, x: Tensor) -> Tensor:
 *   relu = self.relu
 *   input_layer = self.input_layer
 *   out = (relu).forward((input_layer).forward(x, ), )
 *   ...
 *   return (output_layer).forward(out0, )
 * }}}
 *
 * We parse that restricted language (assignments, `self.attr`,
 * `getattr(self, "0")`, `(expr).forward(arg, )` calls, and the
 * functional forms `torch.relu(x)` / `__torch__.torch.nn.functional
 * .relu(x, False, )`) and TRACE the root module's forward with a
 * symbolic tensor, emitting a flat [[TorchOp]] list. `torch.nn` module
 * classes (Linear, ReLU, Sigmoid, Tanh, GELU, Softmax, LogSoftmax,
 * Identity, Dropout, Flatten, Sequential) are builtins — their
 * generated code bottoms out in ATen calls we implement directly.
 * Anything outside this surface fails loudly at LOAD time with the
 * offending class/line, in the spirit of the reference's narrow type
 * dispatch (reference src/udf.rs:59-64).
 */
object TorchCode {

  // ---------------------------------------------------------------- AST
  sealed trait Expr
  final case class EName(name: String) extends Expr
  final case class ESelfAttr(attr: String) extends Expr // self.x / getattr(self, "x")
  final case class EForward(target: Expr, args: Vector[Expr]) extends Expr
  /** torch.relu(x, ...) / __torch__.torch.nn.functional.relu(x, ...) */
  final case class EFnCall(qualName: String, args: Vector[Expr]) extends Expr
  final case class ELit(value: Any) extends Expr // Long | Double | Boolean | String | null
  final case class EList(items: Vector[Expr]) extends Expr // [1] dim lists

  /** `lhs` empty = return; one name = plain assignment; several names =
    * tuple-unpack (`out, hn, = _0` — how generated code consumes an
    * RNN's (output, h_n) return). */
  final case class Stmt(lhs: Vector[String], expr: Expr, line: String)
  /** `paramName2` is set for a TWO-TENSOR forward — the
    * encoder-decoder cross-attention entry `def forward(self, x, y)`
    * (y = the key/value-side sequence); only the ROOT module may carry
    * one (submodule forwards stay single-tensor). */
  final case class ClassDef(fqName: String, paramName: String, body: Vector[Stmt],
      paramName2: Option[String] = None)

  // ------------------------------------------------------ code parsing

  /** Parse every `.py` entry under `code/` into fq-class-name → ClassDef.
   * fq name = path between `code/` and `.py` with '/'→'.', plus the
   * class name (matches the pickle's GLOBAL module.name exactly). */
  def parseClasses(entries: Map[String, Array[Byte]], root: String): Map[String, ClassDef] = {
    val out = Map.newBuilder[String, ClassDef]
    for ((name, bytes) <- entries) {
      val rel = name.stripPrefix(root)
      if (rel.startsWith("code/") && rel.endsWith(".py")) {
        val prefix = rel.stripPrefix("code/").stripSuffix(".py").replace('/', '.')
        val text = new String(bytes, "UTF-8")
        for (cd <- parseFile(prefix, text)) out += cd.fqName -> cd
      }
    }
    out.result()
  }

  /** Split a generated .py file into class blocks and parse each
   * `forward`. Classes without a parseable single-tensor forward are
   * skipped here (error surfaces only if something calls them). */
  private def parseFile(prefix: String, text: String): Vector[ClassDef] = {
    val lines = text.split("\n", -1).toVector
    val classStarts = lines.zipWithIndex.collect {
      case (l, i) if l.startsWith("class ") => i
    }
    classStarts.zipWithIndex.flatMap { case (start, ci) =>
      val end = if (ci + 1 < classStarts.length) classStarts(ci + 1) else lines.length
      val header = lines(start)
      val clsName = header.stripPrefix("class ").takeWhile(c => c != '(' && c != ':').trim
      parseForward(lines.slice(start + 1, end)).map { case (param, p2, body) =>
        ClassDef(s"$prefix.$clsName", param, body, p2)
      }
    }
  }

  /** Find `def forward(` in a class body; return (tensor param name,
   * parsed statements). The signature may span lines; the body is the
   * indented block after it. */
  private def parseForward(
      classBody: Vector[String]): Option[(String, Option[String], Vector[Stmt])] = {
    val defIdx = classBody.indexWhere(_.trim.startsWith("def forward("))
    if (defIdx < 0) return None
    val defIndent = classBody(defIdx).takeWhile(_ == ' ').length
    // collect signature lines until the one ending with ':'
    var sigEnd = defIdx
    while (!classBody(sigEnd).trim.endsWith(":")) sigEnd += 1
    val sig = classBody.slice(defIdx, sigEnd + 1).mkString(" ")
    val params = sig.substring(sig.indexOf('(') + 1, sig.lastIndexOf(')'))
    // split top-level commas (types like Optional[int] carry no commas here)
    val names = params.split(',').toVector
      .map(_.trim.takeWhile(c => c != ':' && c != '=').trim)
      .filter(_.nonEmpty)
    // self + one tensor, or self + two tensors (the cross-attention
    // root form def forward(self, x, y) — see ClassDef.paramName2)
    if (names.length != 2 && names.length != 3) return None
    val body = Vector.newBuilder[Stmt]
    var i = sigEnd + 1
    var done = false
    while (i < classBody.length && !done) {
      val line = classBody(i)
      val trimmed = line.trim
      if (trimmed.isEmpty) { /* skip */ }
      else if (line.takeWhile(_ == ' ').length <= defIndent) done = true
      else body += parseStmt(trimmed)
      i += 1
    }
    Some((names(1), names.lift(2), body.result()))
  }

  private def parseStmt(line: String): Stmt = {
    if (line.startsWith("return "))
      Stmt(Vector.empty, parseExpr(line.stripPrefix("return ").trim, line), line)
    else {
      // `name = expr` or `name : Type = expr`; '=' at depth 0 only
      var depth = 0
      var eq = -1
      var j = 0
      while (j < line.length && eq < 0) {
        line(j) match {
          case '(' | '[' => depth += 1
          case ')' | ']' => depth -= 1
          // assignment '=' only: not the 2nd char of '==' and not part
          // of '!='/'<='/'>=' — a comparison statement must fail loudly
          case '=' if depth == 0 && (j + 1 >= line.length || line(j + 1) != '=') &&
              (j == 0 || "=!<>".indexOf(line(j - 1)) < 0) => eq = j
          case _ =>
        }
        j += 1
      }
      if (eq < 0) sys.error(s"TorchScript code: unsupported statement: $line")
      val lhs = line.substring(0, eq).trim
      // one name (optionally `name : Type`) or a comma-separated unpack
      // target (`out, hn, =` — the generator leaves a trailing comma)
      val names = lhs.split(',').toVector.map(_.trim).filter(_.nonEmpty)
        .map(_.takeWhile(c => c != ':' && c != ' '))
      if (names.isEmpty || names.exists(n =>
          n.isEmpty || !n.forall(c => c.isLetterOrDigit || c == '_')))
        sys.error(s"TorchScript code: unsupported assignment target: $line")
      Stmt(names, parseExpr(line.substring(eq + 1).trim, line), line)
    }
  }

  // Minimal recursive-descent expression parser over one statement.
  private def parseExpr(s: String, line: String): Expr = {
    val p = new ExprParser(s, line)
    val e = p.expr()
    p.skipWs()
    if (!p.atEnd) sys.error(s"TorchScript code: trailing input in: $line")
    e
  }

  private final class ExprParser(s: String, line: String) {
    private var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (pos < s.length && s(pos) == ' ') pos += 1
    private def fail(msg: String): Nothing =
      sys.error(s"TorchScript code: $msg at col $pos in: $line")
    private def expect(tok: String): Unit = {
      skipWs()
      if (!s.startsWith(tok, pos)) fail(s"expected '$tok'")
      pos += tok.length
    }
    private def ident(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
      if (pos == start) fail("expected identifier")
      s.substring(start, pos)
    }

    def expr(): Expr = {
      skipWs()
      if (atEnd) fail("expected expression")
      s(pos) match {
        case '(' =>
          pos += 1
          val inner = expr()
          expect(")")
          expect(".")
          val m = ident()
          if (m != "forward") fail(s"unsupported method .$m (only .forward)")
          expect("(")
          val args = argList()
          // trailing Nones are generator-emitted optionals (e.g.
          // EmbeddingBag's offsets / per_sample_weights) — droppable;
          // single-tensor enforcement happens at APPLY time (the
          // MultiheadAttention module legitimately takes (q, k, v, …))
          val real = args.reverse.dropWhile(_ == ELit(null)).reverse
          if (real.isEmpty) fail(".forward with no tensor args")
          EForward(inner, real)
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Expr]
          skipWs()
          while (pos < s.length && s(pos) != ']') {
            items += expr()
            skipWs()
            if (pos < s.length && s(pos) == ',') { pos += 1; skipWs() }
          }
          expect("]")
          EList(items.result())
        case '"' =>
          val end = s.indexOf('"', pos + 1)
          if (end < 0) fail("unterminated string")
          val v = s.substring(pos + 1, end); pos = end + 1
          ELit(v)
        case c if c.isDigit || c == '-' =>
          val start = pos
          pos += 1
          while (pos < s.length && (s(pos).isDigit || s(pos) == '.' || s(pos) == 'e' ||
            s(pos) == 'E' || s(pos) == '-' || s(pos) == '+')) pos += 1
          val tok = s.substring(start, pos)
          if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) ELit(tok.toDouble)
          else ELit(tok.toLong)
        case _ =>
          val first = ident()
          first match {
            case "None" => ELit(null)
            case "True" => ELit(true)
            case "False" => ELit(false)
            case "self" =>
              expect(".")
              ESelfAttr(ident())
            case "getattr" =>
              expect("("); expect("self"); expect(",")
              skipWs()
              val attr = expr() match {
                case ELit(v: String) => v
                case other => fail(s"getattr with non-string attr $other")
              }
              expect(")")
              ESelfAttr(attr)
            case _ =>
              // qualified fn call (torch.relu / __torch__...functional.relu)
              // or a plain local name
              val parts = mutable.ArrayBuffer(first)
              skipWs()
              while (pos < s.length && s(pos) == '.') {
                pos += 1
                parts += ident()
                skipWs()
              }
              if (pos < s.length && s(pos) == '(') {
                pos += 1
                EFnCall(parts.mkString("."), argList())
              } else if (parts.length == 1) EName(first)
              else fail(s"unsupported attribute chain ${parts.mkString(".")}")
          }
      }
    }

    /** Args up to the closing ')', tolerating the trailing comma the
     * generator emits (`(x, )`). Consumes the ')'. */
    private def argList(): Vector[Expr] = {
      val args = Vector.newBuilder[Expr]
      skipWs()
      var done = false
      while (!done) {
        skipWs()
        if (atEnd) fail("unterminated call")
        if (s(pos) == ')') { pos += 1; done = true }
        else {
          args += expr()
          skipWs()
          if (pos < s.length && s(pos) == ',') pos += 1
        }
      }
      args.result()
    }
  }

  // ---------------------------------------------------- symbolic trace

  /** A module instance decoded from data.pkl: fq class name + attrs in
   * registration order (submodules, tensors, prims). */
  final case class ModuleNode(fqName: String,
      attrs: mutable.LinkedHashMap[String, Any]) {
    def simpleName: String = fqName.substring(fqName.lastIndexOf('.') + 1)
    def isTorchNn: Boolean = fqName.contains(".torch.nn.modules.")
  }

  /** The symbolic tensor flowing through the trace — shape CLASS, not
   * concrete sizes (the batch and sequence dims stay free). */
  sealed trait Sym
  object Sym {
    /** `(n, dim)` feature matrix; `dim == -1` until the first
      * parameterized op binds it. */
    final case class Flat(dim: Int) extends Sym
    /** `(n, seq, emb)` embedding sequence (nn.Embedding output). */
    final case class SeqEmb(emb: Int) extends Sym
    /** `(n, ch, seq)` channel-major sequence (after transpose(1, 2) —
      * Conv1d's input layout). */
    final case class ChanSeq(ch: Int) extends Sym
    /** `(n, ch, H, W)` image tensor (Conv2d's layout; H/W stay free —
      * the vision-classifier phase). */
    final case class ChanHW(ch: Int) extends Sym
    /** A HELD image-phase pipeline (convs / channel affines /
      * activations accumulated since the last live tensor): fused into
      * [[ResBlock2dOp]] when a residual `torch.add(x, ·)` closes it,
      * or materialized op-by-op on any plain consumption (pooling,
      * a non-shape-preserving stage). */
    final case class ImgPipe(stages: Vector[TorchOp], inCh: Int, outCh: Int) extends Sym
    /** `(n, ch, 1)` pooled but unflattened (AdaptiveMaxPool1d(1)
      * output); flatten/squeeze converts to Flat(ch). */
    final case class Pooled(ch: Int) extends Sym
    /** A position-wise Linear applied to the live `(n, seq, emb)`
      * sequence — NOT emitted as an op: it is one leg of a self-attention
      * block, fused into [[SelfAttentionOp]] when the closing
      * `matmul(softmax(matmul(q, k^T) * scale), v)` pattern completes.
      * Any other consumption fails loudly (the op-list execution model
      * is a linear chain; a lone sequence projection has no home). */
    final case class SeqProj(l: LinearLayer) extends Sym
    /** `transpose(-2, -1)` of a [[SeqProj]] — the K^T leg. */
    final case class SeqProjT(p: SeqProj) extends Sym
    /** `(n, seq, seq)` raw attention scores `matmul(q, k^T) * scale`;
      * `causal` is set when an additive upper-triangular `-inf` mask
      * (a sliced buffer, see [[BufSlice]]) has been summed in. */
    final case class AttnScores(q: SeqProj, k: SeqProj, scale: Double,
        causal: Boolean = false,
        bias: Option[BufSlice] = None,
        rope: Option[(BufSlice, BufSlice)] = None) extends Sym
    /** Row-softmaxed attention weights, awaiting the `matmul(·, v)`. */
    final case class AttnWeights(q: SeqProj, k: SeqProj, scale: Double,
        causal: Boolean = false,
        bias: Option[BufSlice] = None,
        rope: Option[(BufSlice, BufSlice)] = None) extends Sym
    /** A completed attention output `(L, Σ head dims)` — HELD, not yet
      * emitted: the consumer decides the fused op. `torch.cat` merges
      * heads, a following Linear becomes the out-projection,
      * `torch.add(x, ·)` fuses the residual into [[EncoderAttnOp]];
      * any plain sequence consumption (mean, transpose, LayerNorm)
      * materializes it as-is (a 1-head, no-proj instance emits the
      * classic [[SelfAttentionOp]], keeping q122-era op lists stable). */
    final case class AttnOut(heads: Vector[SelfAttentionOp],
        proj: Option[LinearLayer]) extends Sym
    /** A value living on the ENCODER stream of a two-input model — the
      * second forward parameter (the key/value-side token sequence)
      * and everything derived from it. Ops applied to the wrapped sym
      * are emitted into the tracer's SEPARATE encoder op list; the one
      * legal crossing back to the main stream is
      * `nn.MultiheadAttention(query_from_x, y_enc, y_enc)` — the
      * cross-attention consumption (see applyMha). */
    final case class EncSide(inner: Sym) extends Sym
    /** A completed CROSS-attention output `(Lq, Σ head dims)` over the
      * main stream — HELD like [[AttnOut]] so the decoder-block
      * residual `torch.add(x, ·)` can fuse into
      * [[graft.torch.CrossAttnOp]]. */
    final case class CrossAttnOut(heads: Vector[SelfAttentionOp],
        proj: Option[LinearLayer]) extends Sym
    /** `matmul(q_main, k_enc^T)` — raw CROSS-attention scores of the
      * hand-rolled two-sequence pattern (query projection over the
      * main stream, key projection over the encoder stream). */
    final case class CrossScores(q: SeqProj, k: SeqProj, scale: Double) extends Sym
    /** Row-softmaxed cross scores, awaiting `matmul(·, v_enc)`. */
    final case class CrossWeights(q: SeqProj, k: SeqProj, scale: Double) extends Sym
    /** `act(l1(x))` over the live sequence — the held first half of a
      * position-wise FFN, awaiting its closing Linear. */
    final case class FfnMid(l1: LinearLayer, act: String) extends Sym
    /** `l2(act(l1(x)))` — a complete position-wise FFN, held for the
      * residual `torch.add(x, ·)` (or materialized without one). */
    final case class FfnOut(l1: LinearLayer, act: String, l2: LinearLayer) extends Sym
    /** `torch.eq(x, pad)` on the RAW token-ids input: a key-padding
      * mask (True AT pads, torch's `key_padding_mask` convention).
      * Only `nn.MultiheadAttention.forward`'s 4th argument consumes
      * it; doing so flips the model head into padded-batch mode
      * ([[graft.torch.EmbeddingSeqOp]] `padIdx`). */
    final case class PadMask(padId: Int) extends Sym
    /** `torch.ne(x, pad)` (or `logical_not` of a [[PadMask]]) on the
      * RAW token-ids input: the VALID-position mask (True at real
      * tokens) of the masked-mean read-out
      * `(x * mask.unsqueeze(-1)).sum(1) / mask.sum(1)`. `asFloat` is
      * set by the bool->float `torch.to` cast, `unsqueezed` by the
      * trailing `torch.unsqueeze(·, -1)` that makes it broadcastable
      * over the feature dim. */
    final case class ValidMask(padId: Int, asFloat: Boolean = false,
        unsqueezed: Boolean = false) extends Sym
    /** `x * validMask.unsqueeze(-1)`: the live `(n, L, emb)` sequence
      * with pad positions zeroed — awaiting `torch.sum(·, [1])`. */
    final case class MaskedSeq(emb: Int, padId: Int) extends Sym
    /** `sum(x * mask, 1)` — the masked-mean numerator `(n, emb)`,
      * awaiting the division by [[LenVec]] that emits
      * [[graft.torch.SeqMaskedMeanPoolOp]]. */
    final case class MaskedSum(emb: Int, padId: Int) extends Sym
    /** `sum(validMaskFloat, 1)` — the per-row valid lengths
      * `(n[, 1])`; keepdim / a later unsqueeze only change broadcast
      * shape, not meaning. */
    final case class LenVec(padId: Int) extends Sym
    /** The dynamic sequence length `torch.size(x, 1)` of the live
      * embedding sequence — only `torch.arange` consumes it (the
      * positional-id ramp of a learned-position encoder). */
    case object SeqLen extends Sym
    /** The dynamic batch size `torch.size(x, 0)` — only the batch dim
      * of `torch.expand` on a latent query array consumes it. */
    case object BatchLen extends Sym
    /** A LEARNED `(m, e)` latent query parameter (`self.latent`,
      * stored 2-D and unsqueezed, or stored `(1, m, e)`) expanded over
      * the batch dim — nn.MultiheadAttention's QUERY in the
      * attention-pooling read-out ([[graft.torch.AttnPoolOp]]). */
    final case class LatentQ(weight: Array[Float], m: Int, e: Int) extends Sym
    /** `torch.arange(size(x, 1))`: the position-id ramp, awaiting its
      * positional-embedding lookup. */
    case object PosIds extends Sym
    /** A positional-embedding table (nn.Embedding) looked up with
      * [[PosIds]] — HELD until the `torch.add(x, ·)` that sums it into
      * the token-embedding sequence emits [[PosEmbedOp]]. */
    final case class PosEmbSeq(weight: Array[Float], maxLen: Int, emb: Int) extends Sym
    /** A registered BUFFER tensor (`self.pe` / `self.causal_mask`)
      * row-sliced to the live sequence length — the serialized shape of
      * `self.pe[:x.size(1)]`. `dims = 1`: sliced on dim 0 only, a
      * `(L, emb)` positional-encoding table (sinusoidal or otherwise
      * PRECOMPUTED — the values ride in the buffer, so the engine never
      * recomputes sin/cos); awaiting the `torch.add(x, ·)` that emits
      * [[PosEmbedOp]]. `dims = 2`: sliced on both dims, a `(L, L)`
      * additive attention mask, CLASSIFIED at slice time: exactly 0 on
      * `j <= i` and `-inf` above the diagonal sets `causalMask` (the
      * GPT-decoder pattern — summed into [[AttnScores]] it becomes the
      * causal flag, keeping pre-bias op lists stable); ANY other
      * finite-or-`-inf` content is a general additive bias (ALiBi
      * slopes, banded local-attention windows) carried verbatim into
      * [[graft.torch.SelfAttentionOp]]'s `bias`. */
    final case class BufSlice(weight: Array[Float], rows: Int, cols: Int,
        dims: Int, causalMask: Boolean = false) extends Sym
    /** `q[:, :, :h]` / `q[:, :, h:]` — one feature-dim half of a HELD
      * attention projection, awaiting the rotate-half recombination of
      * rotary position embeddings (RoPE, Su et al. 2021 — the Llama
      * position encoding): `rope(x) = x·cos + rotate_half(x)·sin`,
      * `rotate_half(x) = cat([-x2, x1], -1)`. Only this idiom consumes
      * a half; anything else fails loudly. */
    final case class FeatHalf(p: SeqProj, hi: Boolean, half: Int) extends Sym
    /** `torch.neg(q[:, :, h:])` — the negated high half. */
    final case class NegFeatHalf(fh: FeatHalf) extends Sym
    /** `cat([-x2, x1], -1)` — `rotate_half` of a held projection. */
    final case class RotHalfSeq(p: SeqProj, half: Int) extends Sym
    /** `x * self.cos[:L]` / `rotate_half(x) * self.sin[:L]` — one leg
      * of the RoPE recombination, awaiting the closing add. */
    final case class BufScaledSeq(p: SeqProj, rotated: Boolean,
        buf: BufSlice) extends Sym
    /** A rotary-embedded projection leg (RoPE applied AFTER the q/k
      * projection, the faithful Llama/RoFormer form): plays SeqProj's
      * role in the attention pattern, carrying the per-position
      * cos/sin tables. */
    final case class RopedProj(p: SeqProj, cos: BufSlice, sin: BufSlice) extends Sym
    /** `transpose(-2, -1)` of a [[RopedProj]] — the rotated K^T leg. */
    final case class RopedProjT(rp: RopedProj) extends Sym
    /** Tuple of traced values — an RNN's forward returns
      * `(output, h_n)` (GRU) / `(output, (h_n, c_n))` (LSTM); consumed
      * by tuple-unpack statements. */
    final case class STuple(items: Vector[Sym]) extends Sym
    /** The `(num_layers·dirs, n, H)` final-hidden-state leg of a
      * GRU/LSTM — held back like [[SeqProj]]: the op is emitted when
      * `squeeze(0)` (1 layer, unidirectional) / `select(0, -1)` (any
      * depth, unidirectional: the TOP layer) collapses the layer dim
      * into the flat `(n, H)` classifier input. For a BIDIRECTIONAL
      * RNN (`dirs` = 2) the read-out is two selects `h_n[-2]` /
      * `h_n[-1]` (forward/reverse top layer, held as [[RnnDirTop]])
      * re-joined by `torch.cat(..., 1)` into the `(n, 2H)` input. */
    final case class RnnHidden(op: RnnOp, hidden: Int, layers: Int,
        dirs: Int) extends Sym
    /** One direction's top-layer final hidden `(n, H)` selected out of
      * a bidirectional h_n — only `cat([fwd, bwd], 1)` consumes it. */
    final case class RnnDirTop(h: RnnHidden, fwd: Boolean) extends Sym
    /** The `(n, L, H·dirs)` full-sequence output of an RNN — consumed
      * only by `mean(dim=1)` (the sentence-encoder pool, fused into
      * the op's `seqPool`); anything else fails loudly. */
    final case class RnnOutSeq(h: RnnHidden, desc: String) extends Sym {
      override def toString: String = desc
    }
    /** An RNN leg nothing may consume (the LSTM cell state c_n): any
      * use fails loudly with this description. */
    final case class RnnSeqOut(desc: String) extends Sym
  }
  import Sym._

  /** Trace context: resolves Linear weights against the archive and
   * collects the flat op list. */
  final class Tracer(
      classes: Map[String, ClassDef],
      materialize: Pickle.PTensor => Array[Float]) {
    private val mainOps = IndexedSeq.newBuilder[TorchOp]
    /** ENCODER-stream ops of a two-input (cross-attention) trace — the
      * module chain applied to the second forward parameter. Becomes
      * [[graft.torch.TorchScriptModel.encOps]]. */
    val encOps = IndexedSeq.newBuilder[TorchOp]
    private var opsCur: scala.collection.mutable.Builder[TorchOp, IndexedSeq[TorchOp]] =
      mainOps
    /** The op sink of the CURRENT stream (main, or encoder inside a
      * second-input module application). */
    def ops: scala.collection.mutable.Builder[TorchOp, IndexedSeq[TorchOp]] = opsCur
    /** Route ops emitted by `f` into the encoder stream. After a
      * cross-attention call consumed the encoder output the leg is
      * FROZEN: held projections (k/v Linears of further hand-rolled
      * heads — no op emitted) still evaluate, but anything that would
      * EMIT an encoder op fails loudly (it would silently change
      * already-shared per-row state). */
    private object FrozenEncOps
        extends scala.collection.mutable.Builder[TorchOp, IndexedSeq[TorchOp]] {
      def addOne(op: TorchOp): this.type = sys.error(
        "TorchScript code: encoder-leg op emitted AFTER cross-attention " +
          "consumed the encoder output (the leg is computed once and " +
          "shared; reorder the forward)")
      def clear(): Unit = ()
      def result(): IndexedSeq[TorchOp] = IndexedSeq.empty
    }
    private def onEnc[T](f: => T): T = {
      val saved = opsCur
      opsCur = if (encConsumed) FrozenEncOps else encOps
      try f finally opsCur = saved
    }
    /** Set when a cross-attention call consumes the encoder output:
      * the enc op list is frozen (every cross op shares ONE encoder
      * output, computed once per row — extending the leg afterwards
      * would silently change already-emitted ops). */
    private var encConsumed = false
    /** Set when a traced `key_padding_mask` (torch.eq(x, pad)) reaches
      * an attention module: the load path rewrites the head
      * [[EmbeddingSeqOp]] with this padIdx (padded-batch mode). */
    var padMaskId: Int = -1

    def trace(root: ModuleNode, in: Sym): Sym = applyModule(root, in)

    /** Two-input trace: `in` binds the main (query-side) parameter,
      * `in2` the encoder (key/value-side) parameter — wrapped in
      * [[Sym.EncSide]] so every op derived from it lands in [[encOps]]. */
    def trace2(root: ModuleNode, in: Sym, in2: Sym): Sym = {
      val cd = classes.getOrElse(root.fqName,
        sys.error(s"two-input trace needs serialized forward code for ${root.fqName}"))
      require(cd.paramName2.isDefined,
        s"${root.fqName}: two-input trace of a single-tensor forward")
      interpret(cd, root, in, Some(EncSide(in2)))
    }

    /** Materialize a held attention/FFN/image sym into the op list (no
      * residual, no further fusion); other syms pass through. */
    private def forceSeq(sy: Sym): Sym = sy match {
      case AttnOut(Vector(h), None) => ops += h; SeqEmb(h.dim)
      case a: AttnOut =>
        val op = EncoderAttnOp(a.heads, a.proj, residual = false)
        ops += op; SeqEmb(op.outDim)
      case c: CrossAttnOut =>
        val op = CrossAttnOp(c.heads, c.proj, residual = false)
        ops += op; SeqEmb(op.outDim)
      case f: FfnOut =>
        val op = PosFfnOp(f.l1, f.act, f.l2, residual = false)
        ops += op; SeqEmb(f.l2.outDim)
      case ip: ImgPipe =>
        ops ++= ip.stages; ChanHW(ip.outCh)
      case other => other
    }

    /** `nn.MultiheadAttention` as a MODULE call `(attn).forward(x, x,
      * x, …)`: the packed `(3E, E)` in_proj is split into per-head
      * Q/K/V projections ([[Mha.split]]), the out-projection rides
      * along, and the result is the same held [[Sym.AttnOut]] the
      * hand-rolled pattern produces — residual/LN/FFN fusion and the
      * `(output, weights)` tuple unpack compose unchanged. SELF
      * attention only (query, key, value must be the SAME traced
      * tensor); masks and non-default flags fail loudly. */
    private def applyMha(m: ModuleNode, args: Seq[Any], line: String): Sym = {
      require(args.length >= 3, s"TorchScript code: ${m.simpleName}.forward " +
        s"needs (query, key, value), got ${args.length} args in: $line")
      val qkv = args.take(3)
      // a LEARNED latent query array as arg 0 is the attention-pooling
      // read-out — the one supported cross-attention form (query from
      // a parameter, key == value == the live sequence)
      val latentQ = qkv(0) match {
        case lq: LatentQ => Some(lq)
        case _ => None
      }
      // CROSS-attention: key == value == the SAME encoder-stream value
      // (the second forward input), query a main-stream live sequence —
      // the T5/BART decoder-block form (reference src/udf.rs:127 runs
      // any such TorchScript via libtorch)
      val crossKv = qkv(1) match {
        case e: EncSide if latentQ.isEmpty &&
            qkv(2).asInstanceOf[AnyRef].eq(e) => Some(e)
        case _ => None
      }
      require(qkv.drop(latentQ.size).forall(_.isInstanceOf[Sym]),
        s"TorchScript code: ${m.simpleName} on non-tensor args in: $line")
      if (crossKv.isDefined)
        require(!qkv(0).isInstanceOf[EncSide],
          s"TorchScript code: ${m.simpleName} query from the encoder stream " +
            s"unsupported (queries come from the MAIN input; keys/values from " +
            s"the second) in: $line")
      else if (latentQ.isEmpty)
        require(qkv(0).asInstanceOf[AnyRef].eq(qkv(1).asInstanceOf[AnyRef]) &&
          qkv(1).asInstanceOf[AnyRef].eq(qkv(2).asInstanceOf[AnyRef]),
          s"TorchScript code: ${m.simpleName} with distinct query/key/value " +
            s"unsupported (self-attention, cross-attention on the traced " +
            s"second input, or a latent-parameter query with key == value) " +
            s"in: $line")
      else
        require(qkv(1).asInstanceOf[AnyRef].eq(qkv(2).asInstanceOf[AnyRef]),
          s"TorchScript code: ${m.simpleName} latent-query pooling needs " +
            s"key == value (the live sequence) in: $line")
      // forward(q, k, v, key_padding_mask, need_weights, attn_mask):
      // arg 3 may be a traced `torch.eq(ids, pad)` mask — the
      // padded-batch convention; it flips the model head into padIdx
      // mode at load (see Tracer.padMaskId). Arg 5 may be a sliced
      // registered buffer `self.mask[:L, :L]` — torch's additive
      // attn_mask, classified at slice time (exactly-causal → the
      // causal flag; anything else → a general per-head bias, the
      // ALiBi / banded-window shape). Any other mask tensor (an
      // untraceable key_padding_mask, a live attn_mask) still fails
      // loudly.
      args.lift(3) match {
        case Some(PadMask(p)) =>
          require(padMaskId < 0 || padMaskId == p,
            s"TorchScript code: conflicting key_padding_mask pad ids " +
              s"($padMaskId vs $p) in: $line")
          padMaskId = p
        case _ =>
      }
      val attnMask = args.lift(5) match {
        case Some(b: BufSlice) if b.dims == 2 => Some(b)
        case _ => None
      }
      // no position-indexed mask has a home ACROSS two sequences, and
      // padding on the encoder side is not traced yet — fail loudly
      require(crossKv.isEmpty || (attnMask.isEmpty && padMaskId < 0 &&
          !args.lift(3).exists(_.isInstanceOf[PadMask])),
        s"TorchScript code: ${m.simpleName} cross-attention with a " +
          s"key_padding_mask / attn_mask unsupported in: $line")
      for ((extra, i) <- args.drop(3).zipWithIndex) extra match {
        case null | _: Boolean => // absent masks / need_weights flags
        case _: PadMask if i == 0 => // consumed above
        case _: BufSlice if i == 2 && attnMask.isDefined => // consumed above
        case other => sys.error(s"TorchScript code: ${m.simpleName} extra arg " +
          s"$other unsupported (non-buffer attn_mask / non-eq " +
          s"key_padding_mask) in: $line")
      }
      def boolA(key: String, dflt: Boolean): Boolean = m.attrs.get(key) match {
        case Some(b: Boolean) => b
        case Some(Pickle.PBool(b)) => b
        case None => dflt
        case Some(other) => sys.error(s"${m.fqName}: non-bool attr $key = $other")
      }
      require(boolA("batch_first", dflt = false),
        s"${m.fqName}: batch_first=False unsupported (construct with batch_first=True)")
      require(!boolA("add_zero_attn", dflt = false),
        s"${m.fqName}: add_zero_attn unsupported")
      m.attrs.get("bias_k") match {
        case None | Some(null) | Some(Pickle.PNone) =>
        case Some(other) => sys.error(s"${m.fqName}: bias_k/bias_v unsupported (got $other)")
      }
      val e = forceSeq(qkv(if (latentQ.isEmpty) 0 else 1).asInstanceOf[Sym]) match {
        case SeqEmb(d) => d
        case other => sys.error(s"${m.fqName} needs the (n, seq, emb) " +
          s"sequence, got $other in: $line")
      }
      latentQ.foreach(lq => require(lq.e == e,
        s"${m.fqName}: latent query width ${lq.e} != sequence embed dim $e"))
      val embed = intAttr(m, "embed_dim", e.toLong).toInt
      require(embed == e, s"${m.fqName}(embed_dim=$embed) applied to $e-dim sequence")
      val numHeads = intAttr(m, "num_heads", -1L).toInt
      def tens(key: String, n: Int): Array[Float] = m.attrs.get(key) match {
        case Some(t: Pickle.PTensor) =>
          val w = materialize(t)
          require(w.length == n, s"${m.fqName}: $key size ${w.length}, expected $n")
          w
        case other => sys.error(s"${m.fqName}: missing tensor '$key' (got $other)")
      }
      // packed (3E, E) in_proj_weight, or — when the module was built
      // with explicit kdim/vdim (`_qkv_same_embed_dim=False`) — three
      // separate (E, E) projection weights. Self-attention feeds one
      // E-dim tensor to all three projections, so kdim/vdim must equal
      // embed here (a mismatched kdim fails the size check loudly);
      // with equal dims torch's use_separate_proj_weight path computes
      // exactly the packed projections, so concatenating into the
      // packed layout and splitting per-head is bit-equivalent.
      val inW =
        if (boolA("_qkv_same_embed_dim", dflt = true))
          tens("in_proj_weight", 3 * embed * embed)
        else
          tens("q_proj_weight", embed * embed) ++
            tens("k_proj_weight", embed * embed) ++
            tens("v_proj_weight", embed * embed)
      val inB = m.attrs.get("in_proj_bias") match {
        case Some(t: Pickle.PTensor) => tens("in_proj_bias", 3 * embed)
        case _ => new Array[Float](3 * embed)
      }
      val heads0 = Mha.split(inW, inB, embed, numHeads)
      // nn.MultiheadAttention applies ONE attn_mask across every head
      val heads = attnMask match {
        case Some(b) if b.causalMask => heads0.map(_.copy(causal = true))
        case Some(b) => heads0.map(_.copy(bias = Some(b.weight), biasRows = b.rows))
        case None => heads0
      }
      val proj = m.attrs.get("out_proj") match {
        case Some(p: ModuleNode) =>
          val w = p.attrs.get("weight") match {
            case Some(t: Pickle.PTensor) =>
              require(t.shape == Vector(embed, embed) || t.shape == Seq(embed, embed),
                s"${m.fqName}: out_proj weight shape ${t.shape}")
              materialize(t)
            case other => sys.error(s"${m.fqName}: out_proj missing weight (got $other)")
          }
          val b = p.attrs.get("bias") match {
            case Some(t: Pickle.PTensor) => materialize(t)
            case _ => new Array[Float](embed)
          }
          LinearLayer(w, b, outDim = embed, inDim = embed)
        case other => sys.error(s"${m.fqName}: missing out_proj module (got $other)")
      }
      crossKv match {
        case Some(encKv) =>
          // finalize the encoder leg: materialize any held sym into the
          // enc op list and freeze it (every cross op shares ONE
          // computed encoder output per row)
          val ek = onEnc(forceSeq(encKv.inner)) match {
            case SeqEmb(d) => d
            case other => sys.error(s"${m.fqName} cross-attention needs the " +
              s"(n, seq, emb) encoder sequence as key/value, got $other in: $line")
          }
          require(ek == e, s"${m.fqName}: encoder output width $ek != " +
            s"query-side embed dim $e (mixed widths unsupported)")
          encConsumed = true
          STuple(Vector(CrossAttnOut(heads.toVector, Some(proj)),
            RnnSeqOut(s"${m.simpleName} attention weights")))
        case None => latentQ match {
          case Some(lq) =>
            // the pool COLLAPSES the sequence: emit eagerly; the traced
            // flatten(a, 1) that follows is shape-only on the flat output
            ops += AttnPoolOp(lq.weight, lq.m, heads.toVector, e, Some(proj))
            STuple(Vector(Flat(lq.m * e),
              RnnSeqOut(s"${m.simpleName} attention weights")))
          case None =>
            STuple(Vector(AttnOut(heads.toVector, Some(proj)),
              RnnSeqOut(s"${m.simpleName} attention weights")))
        }
      }
    }

    /** An elementwise activation applied to whatever shape is live:
      * extends a held image pipe, turns a held sequence projection into
      * the FFN's first half (ActOp kinds only), otherwise materializes
      * and emits. */
    private def elemAct(op: TorchOp, s: Sym): Sym = (op, s) match {
      case (_, ip: ImgPipe) => ip.copy(stages = ip.stages :+ op)
      case (ActOp(kind), p: SeqProj) => FfnMid(p.l, kind) // held: FFN first half
      case (_, p: SeqProj) => sys.error(
        s"parameterized activation on a held sequence projection unsupported")
      case _ =>
        val sy = forceSeq(s)
        ops += op
        sy
    }

    /** Apply a module to the symbolic tensor; returns the output shape.
      * An [[Sym.EncSide]] input routes the application (and every op it
      * emits) onto the encoder stream, re-wrapping the result. */
    def applyModule(m: ModuleNode, s: Sym): Sym = s match {
      case EncSide(inner) =>
        EncSide(onEnc(applyModule(m, inner)))
      case _ =>
        if (m.isTorchNn) builtinOp(m, s)
        else classes.get(m.fqName) match {
          case Some(cd) => interpret(cd, m, s)
          case None => sys.error(s"unsupported TorchScript op: ${m.fqName} " +
            "(no builtin and no serialized forward code)")
        }
    }

    private def intAttr(m: ModuleNode, key: String, dflt: Long): Long =
      m.attrs.get(key) match {
        case Some(n: Long) => n
        case Some(Pickle.PInt(n)) => n
        case None => dflt
        case Some(other) => sys.error(s"${m.fqName}: non-int attr $key = $other")
      }

    private def floatAttr(m: ModuleNode, key: String, dflt: Double): Double =
      m.attrs.get(key) match {
        case Some(d: Double) => d
        case Some(n: Long) => n.toDouble
        case Some(Pickle.PFloat(d)) => d
        case None => dflt
        case Some(other) => sys.error(s"${m.fqName}: non-float attr $key = $other")
      }

    /** Conv/pool hyper-params serialize as ints OR 1-tuples depending
      * on module and torch version; accept both. */
    private def sizeAttr(m: ModuleNode, key: String, dflt: Long): Long =
      m.attrs.get(key) match {
        case Some(n: Long) => n
        case Some(Pickle.PInt(n)) => n
        case Some(Pickle.PTuple(Vector(Pickle.PInt(n)))) => n
        case Some(null) | None => dflt
        case Some(other) => sys.error(s"${m.fqName}: non-size attr $key = $other")
      }

    private def embeddingWeight(m: ModuleNode): Pickle.PTensor =
      m.attrs.get("weight") match {
        case Some(t: Pickle.PTensor) if t.shape.length == 2 => t
        case other => sys.error(s"${m.fqName}: missing 2-D tensor 'weight' (got $other)")
      }

    /** Flat-only ops reject sequence shapes with a pointed message. */
    private def flatDim(m: ModuleNode, s: Sym): Int = s match {
      case Flat(d) => d
      case Pooled(_) => sys.error(s"${m.fqName} applied to an unflattened " +
        "(n, ch, 1) pool output (flatten/squeeze missing)")
      case other => sys.error(s"${m.fqName} applied to an unpooled sequence " +
        s"($other): pool it (mean(dim=1) / AdaptiveMaxPool1d) first")
    }

    private def builtinOp(m: ModuleNode, s: Sym): Sym = m.simpleName match {
      case "Embedding" =>
        // token-id input -> (seq, embDim); a padding_idx row (if any)
        // participates with its stored vector, exactly as torch looks
        // it up — a following mean(1) divides by the full length.
        // Applied to the arange position ramp instead, it is the
        // learned positional table — HELD for the residual-style add
        s match {
          case PosIds =>
            val w = embeddingWeight(m)
            PosEmbSeq(materialize(w), w.shape(0), w.shape(1))
          case Flat(-1) =>
            val w = embeddingWeight(m)
            ops += EmbeddingSeqOp(materialize(w), w.shape(0), w.shape(1))
            SeqEmb(w.shape(1))
          case other => sys.error(s"${m.fqName}: embedding must consume the raw " +
            s"token input or an arange position ramp (got $other)")
        }
      case "EmbeddingBag" =>
        // fastText head: lookup + pool in one module. mode='mean' only;
        // padding_idx entries are excluded from numerator AND
        // denominator (torch's EmbeddingBag padding semantics).
        require(s == Flat(-1), s"${m.fqName}: embedding must consume the raw token input")
        val mode = m.attrs.get("mode") match {
          case Some(s: String) => s
          case None => "mean"
          case Some(other) => sys.error(s"${m.fqName}: non-string mode $other")
        }
        require(mode == "mean", s"${m.fqName}: EmbeddingBag mode '$mode' unsupported (mean only)")
        val padIdx = m.attrs.get("padding_idx") match {
          case Some(n: Long) => n.toInt
          case Some(Pickle.PInt(n)) => n.toInt
          case Some(null) | None => -1
          case Some(other) => sys.error(s"${m.fqName}: non-int padding_idx $other")
        }
        val w = embeddingWeight(m)
        require(padIdx < w.shape(0), s"${m.fqName}: padding_idx $padIdx out of vocab")
        ops += EmbeddingMeanOp(materialize(w), w.shape(0), w.shape(1), padIdx)
        Flat(w.shape(1))
      case "Linear" =>
        val w = m.attrs.get("weight") match {
          case Some(t: Pickle.PTensor) => t
          case other => sys.error(s"linear module missing tensor 'weight' (got $other)")
        }
        require(w.shape.length == 2, s"linear weight must be 2-D, got ${w.shape}")
        val (out, in) = (w.shape(0), w.shape(1))
        val bias = m.attrs.get("bias") match {
          case Some(t: Pickle.PTensor) =>
            require(t.shape.length == 1 && t.shape(0) == out,
              s"bias shape ${t.shape} incompatible with weight ${w.shape}")
            materialize(t)
          case Some(null) | Some(Pickle.PNone) | None => new Array[Float](out)
          case other => sys.error(s"linear module missing tensor 'bias' (got $other)")
        }
        s match {
          case SeqEmb(e) =>
            // position-wise projection of the live sequence: one leg of
            // a self-attention block OR an FFN's first dense — held
            // back, fused when the consumer decides (see Sym.SeqProj)
            require(e == in, s"Linear(${in}→$out) applied to $e-dim sequence")
            SeqProj(LinearLayer(materialize(w), bias, outDim = out, inDim = in))
          case a: AttnOut if a.proj.isEmpty =>
            // position-wise out-projection of the concatenated heads
            val cat = a.heads.map(_.dim).sum
            require(cat == in, s"Linear(${in}→$out) applied to $cat concatenated head dims")
            AttnOut(a.heads, Some(LinearLayer(materialize(w), bias, outDim = out, inDim = in)))
          case c: CrossAttnOut if c.proj.isEmpty =>
            // out-projection of concatenated CROSS-attention heads
            val cat = c.heads.map(_.dim).sum
            require(cat == in, s"Linear(${in}→$out) applied to $cat concatenated head dims")
            CrossAttnOut(c.heads, Some(LinearLayer(materialize(w), bias, outDim = out, inDim = in)))
          case m0: FfnMid =>
            // the FFN's closing dense: l2(act(l1(x))) — still held for
            // a possible residual add
            require(m0.l1.outDim == in,
              s"Linear(${in}→$out) applied to ${m0.l1.outDim} FFN hidden features")
            FfnOut(m0.l1, m0.act, LinearLayer(materialize(w), bias, outDim = out, inDim = in))
          case _ =>
            // dim == -1: the symbolic input whose dim the first executed
            // Linear binds (activations before it don't change the count)
            val dim = flatDim(m, s)
            require(dim == -1 || dim == in, s"Linear(${in}→$out) applied to $dim features")
            ops += LinearLayer(materialize(w), bias, outDim = out, inDim = in)
            Flat(out)
        }
      case "Conv1d" =>
        // channel-major input only: (n, inCh, L) — exactly torch's
        // contract, so an un-transposed embedding fails loudly here
        val ch = s match {
          case ChanSeq(c) => c
          case SeqEmb(_) => sys.error(s"${m.fqName} applied to the (n, seq, emb) " +
            "embedding output: transpose(1, 2) missing before Conv1d")
          case other => sys.error(s"${m.fqName} needs (n, ch, seq) input, got $other")
        }
        val w = m.attrs.get("weight") match {
          case Some(t: Pickle.PTensor) if t.shape.length == 3 => t
          case other => sys.error(s"${m.fqName}: missing 3-D tensor 'weight' (got $other)")
        }
        // weight is (outCh, inCh/groups, k) — nn.Conv1d's grouped layout
        val groups = sizeAttr(m, "groups", 1).toInt
        require(groups >= 1, s"${m.fqName}: groups $groups invalid")
        val (outCh, inCh, k) = (w.shape(0), w.shape(1) * groups, w.shape(2))
        require(outCh % groups == 0,
          s"${m.fqName}: groups=$groups must divide out_channels=$outCh")
        require(ch == inCh, s"Conv1d(in=$inCh) applied to $ch channels")
        val dilation = sizeAttr(m, "dilation", 1).toInt
        require(dilation >= 1, s"${m.fqName}: dilation $dilation invalid")
        val stride = sizeAttr(m, "stride", 1).toInt
        require(stride >= 1, s"${m.fqName}: stride $stride invalid")
        val padding = m.attrs.get("padding") match {
          case Some("valid") | Some(Pickle.PStr("valid")) => 0L
          case Some("same") | Some(Pickle.PStr("same")) =>
            // torch raises for padding='same' with stride != 1, and an
            // even-span kernel would need asymmetric padding
            require(stride == 1,
              s"${m.fqName}: padding='same' requires stride=1 (got $stride)")
            require(k % 2 == 1,
              s"${m.fqName}: padding='same' needs an odd kernel (got $k)")
            dilation.toLong * (k - 1) / 2
          case _ => sizeAttr(m, "padding", 0)
        }
        require(padding >= 0, s"${m.fqName}: padding $padding invalid")
        val bias = m.attrs.get("bias") match {
          case Some(t: Pickle.PTensor) =>
            require(t.shape.length == 1 && t.shape(0) == outCh,
              s"bias shape ${t.shape} incompatible with weight ${w.shape}")
            materialize(t)
          case Some(null) | Some(Pickle.PNone) | None => new Array[Float](outCh)
          case other => sys.error(s"${m.fqName}: bad conv bias $other")
        }
        ops += Conv1dOp(materialize(w), bias, outCh, inCh, k, stride,
          pad = padding.toInt, groups = groups, dilation = dilation)
        ChanSeq(outCh)
      case "ConstantPad1d" =>
        // the causal-conv idiom: nn.ConstantPad1d((span-1, 0), 0.0)
        // before a valid Conv1d. Zero padding only — the conv's own
        // symmetric zero pad and this op must agree on semantics.
        s match {
          case ChanSeq(c) =>
            val (pl, pr) = m.attrs.get("padding") match {
              case Some(Pickle.PTuple(Vector(Pickle.PInt(a), Pickle.PInt(b)))) => (a, b)
              case Some(n: Long) => (n, n)
              case Some(Pickle.PInt(n)) => (n, n)
              case other => sys.error(s"${m.fqName}: bad padding $other")
            }
            require(pl >= 0 && pr >= 0, s"${m.fqName}: negative padding ($pl, $pr)")
            val v = floatAttr(m, "value", 0.0)
            require(v == 0.0,
              s"${m.fqName}: nonzero pad value $v unsupported (zero padding only)")
            ops += Pad1dOp(pl.toInt, pr.toInt)
            ChanSeq(c)
          case other => sys.error(s"${m.fqName} needs (n, ch, seq) input, got $other")
        }
      case "Conv2d" =>
        val w = m.attrs.get("weight") match {
          case Some(t: Pickle.PTensor) if t.shape.length == 4 => t
          case other => sys.error(s"${m.fqName}: missing 4-D tensor 'weight' (got $other)")
        }
        // weight is (outCh, inCh/groups, kh, kw) — nn.Conv2d's grouped
        // layout; groups == in == out channels is the depthwise conv of
        // a MobileNet-style separable block
        val groups = sizeAttr(m, "groups", 1).toInt
        require(groups >= 1, s"${m.fqName}: groups $groups invalid")
        val (outCh, inCh, kh, kw) =
          (w.shape(0), w.shape(1) * groups, w.shape(2), w.shape(3))
        require(outCh % groups == 0,
          s"${m.fqName}: groups=$groups must divide out_channels=$outCh")
        def pair(key: String, dflt: Long): (Long, Long) = m.attrs.get(key) match {
          case Some(Pickle.PTuple(Vector(Pickle.PInt(a), Pickle.PInt(b)))) => (a, b)
          case Some(Pickle.PTuple(Vector(Pickle.PInt(a)))) => (a, a)
          case Some(n: Long) => (n, n)
          case Some(Pickle.PInt(n)) => (n, n)
          case Some("valid") | Some(Pickle.PStr("valid")) if key == "padding" => (0L, 0L)
          case Some("same") | Some(Pickle.PStr("same")) if key == "padding" =>
            require(kh == kw && kh % 2 == 1,
              s"${m.fqName}: padding='same' needs a square odd kernel (got ${kh}x$kw)")
            val (dh, _) = pair("dilation", 1)
            (dh * (kh - 1) / 2L, dh * (kw - 1) / 2L)
          case Some(null) | None => (dflt, dflt)
          case Some(other) => sys.error(s"${m.fqName}: bad $key $other")
        }
        val (dh, dw) = pair("dilation", 1)
        require(dh == dw && dh >= 1,
          s"${m.fqName}: dilation ($dh, $dw) unsupported (square only)")
        val (sh, sw) = pair("stride", 1)
        require(sh == sw && sh >= 1, s"${m.fqName}: stride ($sh, $sw) unsupported (square only)")
        m.attrs.get("padding") match {
          case Some("same") | Some(Pickle.PStr("same")) =>
            // torch raises for padding='same' with stride != 1
            require(sh == 1,
              s"${m.fqName}: padding='same' requires stride=1 (got $sh)")
          case _ =>
        }
        val (ph, pw) = pair("padding", 0)
        require(ph == pw && ph >= 0,
          s"${m.fqName}: padding ($ph, $pw) unsupported (symmetric only)")
        val bias = m.attrs.get("bias") match {
          case Some(t: Pickle.PTensor) =>
            require(t.shape.length == 1 && t.shape(0) == outCh,
              s"bias shape ${t.shape} incompatible with weight ${w.shape}")
            materialize(t)
          case Some(null) | Some(Pickle.PNone) | None => new Array[Float](outCh)
          case other => sys.error(s"${m.fqName}: bad conv bias $other")
        }
        val op = Conv2dOp(materialize(w), bias, outCh, inCh, kh, kw, sh.toInt,
          ph.toInt, groups, dilation = dh.toInt)
        s match {
          case Flat(-1) =>
            // raw model input: the stem conv binds the (n, ch, H, W)
            // image layout and emits eagerly
            ops += op
            ChanHW(outCh)
          case ChanHW(c) =>
            // a conv past the stem STARTS a held pipe — a residual add
            // may still close it into a ResBlock2dOp
            require(c == inCh, s"Conv2d(in=$inCh) applied to $c channels")
            ImgPipe(Vector(op), c, outCh)
          case ip: ImgPipe =>
            require(ip.outCh == inCh, s"Conv2d(in=$inCh) applied to ${ip.outCh} channels")
            ImgPipe(ip.stages :+ op, ip.inCh, outCh)
          case other => sys.error(s"${m.fqName} needs (n, ch, H, W) input, got $other")
        }
      case "MaxPool2d" | "AvgPool2d" =>
        forceSeq(s) match {
          case c: ChanHW =>
            val k = sizeAttr(m, "kernel_size", -1).toInt
            require(k >= 1, s"${m.fqName}: kernel_size missing (square kernels only)")
            val stride = sizeAttr(m, "stride", k).toInt
            require(sizeAttr(m, "padding", 0) == 0, s"${m.fqName}: padding unsupported")
            require(sizeAttr(m, "dilation", 1) == 1, s"${m.fqName}: dilation unsupported")
            ops += (if (m.simpleName == "MaxPool2d") MaxPool2dOp(k, stride)
                    else AvgPool2dOp(k, stride))
            c
          case other => sys.error(s"${m.fqName} needs (n, ch, H, W) input, got $other")
        }
      case "AdaptiveMaxPool2d" | "AdaptiveAvgPool2d" =>
        forceSeq(s) match {
          case ChanHW(c) =>
            val outSize = m.attrs.get("output_size") match {
              case Some(Pickle.PTuple(Vector(Pickle.PInt(a), Pickle.PInt(b)))) => (a, b)
              case Some(n: Long) => (n, n)
              case Some(Pickle.PInt(n)) => (n, n)
              case other => sys.error(s"${m.fqName}: bad output_size $other")
            }
            require(outSize == ((1L, 1L)),
              s"${m.fqName}: output_size $outSize unsupported (1 = global pool only)")
            ops += GlobalPool2dOp(max = m.simpleName == "AdaptiveMaxPool2d")
            Pooled(c)
          case other => sys.error(s"${m.fqName} needs (n, ch, H, W) input, got $other")
        }
      case "MaxPool1d" =>
        s match {
          case ChanSeq(c) =>
            val k = sizeAttr(m, "kernel_size", -1).toInt
            require(k >= 1, s"${m.fqName}: kernel_size missing")
            val stride = sizeAttr(m, "stride", k).toInt // torch default: stride = kernel
            require(sizeAttr(m, "padding", 0) == 0, s"${m.fqName}: padding unsupported")
            require(sizeAttr(m, "dilation", 1) == 1, s"${m.fqName}: dilation unsupported")
            m.attrs.get("ceil_mode") match {
              case Some(true) | Some(Pickle.PBool(true)) =>
                sys.error(s"${m.fqName}: ceil_mode unsupported")
              case _ =>
            }
            ops += MaxPool1dOp(k, stride)
            ChanSeq(c)
          case other => sys.error(s"${m.fqName} needs (n, ch, seq) input, got $other")
        }
      case "AvgPool1d" =>
        s match {
          case ChanSeq(c) =>
            val k = sizeAttr(m, "kernel_size", -1).toInt
            require(k >= 1, s"${m.fqName}: kernel_size missing")
            val stride = sizeAttr(m, "stride", k).toInt // torch default: stride = kernel
            require(sizeAttr(m, "padding", 0) == 0, s"${m.fqName}: padding unsupported")
            m.attrs.get("ceil_mode") match {
              case Some(true) | Some(Pickle.PBool(true)) =>
                sys.error(s"${m.fqName}: ceil_mode unsupported")
              case _ =>
            }
            // count_include_pad only matters with padding > 0
            ops += AvgPool1dOp(k, stride)
            ChanSeq(c)
          case other => sys.error(s"${m.fqName} needs (n, ch, seq) input, got $other")
        }
      case "AdaptiveMaxPool1d" | "AdaptiveAvgPool1d" =>
        s match {
          case ChanSeq(c) =>
            val outSize = sizeAttr(m, "output_size", -1)
            require(outSize == 1,
              s"${m.fqName}: output_size $outSize unsupported (1 = global pool only)")
            ops += (if (m.simpleName == "AdaptiveMaxPool1d") SeqMaxPoolOp else SeqAvgPoolOp)
            Pooled(c)
          case other => sys.error(s"${m.fqName} needs (n, ch, seq) input, got $other")
        }
      case "ReLU" => elemAct(ActOp("relu"), s)
      case "Sigmoid" => elemAct(ActOp("sigmoid"), s)
      case "Tanh" => elemAct(ActOp("tanh"), s)
      case "GELU" => elemAct(ActOp("gelu"), s)
      case "SiLU" => elemAct(ActOp("silu"), s)
      case "LeakyReLU" =>
        elemAct(ParamActOp("leaky_relu", floatAttr(m, "negative_slope", 0.01), 0), s)
      case "ELU" => elemAct(ParamActOp("elu", floatAttr(m, "alpha", 1.0), 0), s)
      case "Hardtanh" =>
        elemAct(ParamActOp("hardtanh",
          floatAttr(m, "min_val", -1.0), floatAttr(m, "max_val", 1.0)), s)
      case "Softplus" =>
        elemAct(ParamActOp("softplus",
          floatAttr(m, "beta", 1.0), floatAttr(m, "threshold", 20.0)), s)
      case "BatchNorm1d" | "BatchNorm2d" =>
        // eval-mode BN is a per-feature (or per-channel) affine; fold
        // it at load time
        def vec(key: String): Array[Float] = m.attrs.get(key) match {
          case Some(t: Pickle.PTensor) if t.shape.length == 1 => materialize(t)
          case other => sys.error(s"${m.fqName}: ${m.simpleName} missing 1-D tensor '$key' (got $other)")
        }
        val (mean, vr) = (vec("running_mean"), vec("running_var"))
        val eps = floatAttr(m, "eps", 1e-5)
        // affine=False stores weight/bias as None
        val gamma = m.attrs.get("weight") match {
          case Some(t: Pickle.PTensor) => materialize(t)
          case _ => Array.fill(mean.length)(1f)
        }
        val beta = m.attrs.get("bias") match {
          case Some(t: Pickle.PTensor) => materialize(t)
          case _ => new Array[Float](mean.length)
        }
        val scale = Array.tabulate(mean.length)(i =>
          (gamma(i) / math.sqrt(vr(i).toDouble + eps)).toFloat)
        val shift = Array.tabulate(mean.length)(i => beta(i) - mean(i) * scale(i))
        (m.simpleName, s) match {
          case ("BatchNorm2d", ChanHW(c)) =>
            // per-channel affine over the (ch, H, W) image
            require(c == mean.length,
              s"BatchNorm2d(${mean.length}) applied to $c channels")
            ops += ChannelAffineOp(scale, shift)
            s
          case ("BatchNorm2d", ip: ImgPipe) =>
            require(ip.outCh == mean.length,
              s"BatchNorm2d(${mean.length}) applied to ${ip.outCh} channels")
            ip.copy(stages = ip.stages :+ ChannelAffineOp(scale, shift))
          case ("BatchNorm2d", other) =>
            sys.error(s"${m.fqName} needs (n, ch, H, W) input, got $other")
          case ("BatchNorm1d", ChanSeq(c)) =>
            // torch's 3-D BatchNorm1d form: per-channel over (ch, L)
            require(c == mean.length,
              s"BatchNorm1d(${mean.length}) applied to $c channels")
            ops += ChannelAffineOp(scale, shift)
            s
          case _ =>
            val dim = flatDim(m, s)
            require(dim == -1 || dim == mean.length,
              s"BatchNorm1d(${mean.length}) applied to $dim features")
            ops += ScaleShiftOp(scale, shift)
            Flat(mean.length)
        }
      case "LayerNorm" =>
        def vecOr(key: String, n: Int, dflt: Float): Array[Float] = m.attrs.get(key) match {
          case Some(t: Pickle.PTensor) if t.shape.length == 1 => materialize(t)
          case _ => Array.fill(n)(dflt) // elementwise_affine=False
        }
        forceSeq(s) match {
          case SeqEmb(d) =>
            // per-position LN over the feature dim of the live sequence
            // (encoder-block usage); normalized_shape must be (d,)
            val gamma = vecOr("weight", d, 1f)
            val beta = vecOr("bias", d, 0f)
            require(gamma.length == d,
              s"LayerNorm(${gamma.length}) applied to $d-dim sequence")
            ops += SeqLayerNormOp(gamma, beta, floatAttr(m, "eps", 1e-5))
            SeqEmb(d)
          case s1 =>
            val dim = flatDim(m, s1)
            require(dim > 0, s"${m.fqName}: LayerNorm before any Linear needs a known dim")
            val gamma = vecOr("weight", dim, 1f)
            val beta = vecOr("bias", dim, 0f)
            require(gamma.length == dim,
              s"LayerNorm(${gamma.length}) applied to $dim features")
            ops += LayerNormOp(gamma, beta, floatAttr(m, "eps", 1e-5))
            Flat(dim)
        }
      case "RMSNorm" =>
        // nn.RMSNorm (torch >= 2.4, the Llama/T5-family norm): no mean
        // subtraction, no bias; `eps=None` (the constructor default)
        // resolves at run time to torch.finfo(x.dtype).eps — our
        // inputs are f32, so pin finfo(float32).eps
        val eps = m.attrs.get("eps") match {
          case Some(d: Double) => d
          case Some(Pickle.PFloat(d)) => d
          case None | Some(null) | Some(Pickle.PNone) => 1.1920928955078125e-7
          case Some(other) => sys.error(s"${m.fqName}: non-float eps $other")
        }
        def rmsGamma(n: Int): Array[Float] = m.attrs.get("weight") match {
          case Some(t: Pickle.PTensor) if t.shape.length == 1 => materialize(t)
          case _ => Array.fill(n)(1f) // elementwise_affine=False
        }
        forceSeq(s) match {
          case SeqEmb(d) =>
            val gamma = rmsGamma(d)
            require(gamma.length == d,
              s"RMSNorm(${gamma.length}) applied to $d-dim sequence")
            ops += SeqRmsNormOp(gamma, eps)
            SeqEmb(d)
          case s1 =>
            val dim = flatDim(m, s1)
            require(dim > 0, s"${m.fqName}: RMSNorm before any Linear needs a known dim")
            val gamma = rmsGamma(dim)
            require(gamma.length == dim,
              s"RMSNorm(${gamma.length}) applied to $dim features")
            ops += RmsNormOp(gamma, eps)
            Flat(dim)
        }
      case "GLU" =>
        // nn.GLU: split the chosen dim in half, y = a * sigmoid(b).
        // Feature-dim only (dim=-1, or the positive index of the
        // feature axis for the live shape).
        val d = intAttr(m, "dim", -1L)
        forceSeq(s) match {
          case SeqEmb(dd) =>
            require(d == -1L || d == 2L,
              s"${m.fqName}: GLU over dim $d unsupported on a (n, seq, emb) " +
                "sequence (feature dim only: -1 or 2)")
            require(dd % 2 == 0, s"GLU on an odd feature width $dd")
            ops += SeqGluOp
            SeqEmb(dd / 2)
          case s1 =>
            require(d == -1L || d == 1L,
              s"${m.fqName}: GLU over dim $d unsupported (feature dim only: -1 or 1)")
            val dim = flatDim(m, s1)
            require(dim > 0, s"${m.fqName}: GLU before any Linear needs a known dim")
            require(dim % 2 == 0, s"GLU on an odd feature width $dim")
            ops += GluOp
            Flat(dim / 2)
        }
      case "Softmax" | "LogSoftmax" =>
        val d = intAttr(m, "dim", -1L)
        require(d == -1L || d == 1L,
          s"${m.simpleName} over dim $d unsupported (feature dim only: -1 or 1)")
        val dim = flatDim(m, s)
        ops += SoftmaxOp(log = m.simpleName == "LogSoftmax")
        Flat(dim)
      case "Identity" | "Dropout" => s // eval-mode no-ops on any shape
      case "GRU" | "LSTM" =>
        // single-layer unidirectional batch-first recurrent head; the
        // forward returns (output, h_n) / (output, (h_n, c_n)) — the
        // op itself is held inside RnnHidden and emitted when the
        // squeeze/select collapses h_n's num_layers dim (only the
        // final-hidden-state classifier shape has a home in the linear
        // op chain; consuming `output` fails loudly)
        val kind = m.simpleName.toLowerCase
        val e = s match {
          case SeqEmb(d) => d
          case other => sys.error(s"${m.fqName} needs the (n, seq, emb) " +
            s"embedding output, got $other")
        }
        def boolAttr(key: String, dflt: Boolean): Boolean = m.attrs.get(key) match {
          case Some(b: Boolean) => b
          case Some(Pickle.PBool(b)) => b
          case None => dflt
          case Some(other) => sys.error(s"${m.fqName}: non-bool attr $key = $other")
        }
        require(boolAttr("batch_first", dflt = false),
          s"${m.fqName}: batch_first=False unsupported (the engine's batch " +
            "layout is (n, seq, emb); construct the module with batch_first=True)")
        val numLayers = intAttr(m, "num_layers", 1L).toInt
        require(numLayers >= 1, s"${m.fqName}: num_layers $numLayers invalid")
        val bidi = boolAttr("bidirectional", dflt = false)
        require(intAttr(m, "proj_size", 0L) == 0L,
          s"${m.fqName}: proj_size unsupported")
        val hd = intAttr(m, "hidden_size", -1L).toInt
        require(hd > 0, s"${m.fqName}: hidden_size missing")
        require(intAttr(m, "input_size", e.toLong) == e.toLong,
          s"${m.fqName}(input_size=${intAttr(m, "input_size", -1L)}) applied " +
            s"to $e-dim sequence")
        val gates = if (kind == "lstm") 4 else 3
        def w2(key: String, rows: Int, cols: Int): Array[Float] = m.attrs.get(key) match {
          case Some(t: Pickle.PTensor) =>
            require(t.shape == Vector(rows, cols) || t.shape == Seq(rows, cols),
              s"${m.fqName}: $key shape ${t.shape}, expected ($rows, $cols)")
            materialize(t)
          case other => sys.error(s"${m.fqName}: missing tensor '$key' (got $other)")
        }
        val hasBias = boolAttr("bias", dflt = true)
        def b1(key: String): Array[Float] = m.attrs.get(key) match {
          case Some(t: Pickle.PTensor) if hasBias =>
            require(t.shape.length == 1 && t.shape(0) == gates * hd,
              s"${m.fqName}: $key shape ${t.shape}")
            materialize(t)
          case _ => new Array[Float](gates * hd)
        }
        // layers past the first consume the full output sequence of
        // the layer below — (L, H), or (L, 2H) when bidirectional
        val stackIn = if (bidi) 2 * hd else hd
        val stack = (1 until numLayers).map { li =>
          RnnStackLayer(
            w2(s"weight_ih_l$li", gates * hd, stackIn),
            w2(s"weight_hh_l$li", gates * hd, hd),
            b1(s"bias_ih_l$li"), b1(s"bias_hh_l$li"))
        }
        // torch serializes the reverse direction's weights per layer
        // with a `_reverse` suffix (torch.nn.RNNBase._flat_weights)
        val rev =
          if (!bidi) IndexedSeq.empty[RnnStackLayer]
          else (0 until numLayers).map { li =>
            val in = if (li == 0) e else stackIn
            RnnStackLayer(
              w2(s"weight_ih_l${li}_reverse", gates * hd, in),
              w2(s"weight_hh_l${li}_reverse", gates * hd, hd),
              b1(s"bias_ih_l${li}_reverse"), b1(s"bias_hh_l${li}_reverse"))
          }.toIndexedSeq
        val op = RnnOp(kind,
          w2("weight_ih_l0", gates * hd, e), w2("weight_hh_l0", gates * hd, hd),
          b1("bias_ih_l0"), b1("bias_hh_l0"), hidden = hd, inDim = e,
          stack = stack.toIndexedSeq, rev = rev)
        val hn = RnnHidden(op, hd, numLayers, dirs = if (bidi) 2 else 1)
        if (kind == "gru")
          STuple(Vector(RnnOutSeq(hn, s"${m.simpleName} full-sequence output"), hn))
        else
          STuple(Vector(RnnOutSeq(hn, s"${m.simpleName} full-sequence output"),
            STuple(Vector(hn, RnnSeqOut(s"${m.simpleName} cell state c_n")))))
      case "Flatten" =>
        // nn.Flatten(start_dim=1): (n, ch, 1) -> (n, ch); identity on
        // an already-flat (n, d). A VARIABLE-length sequence cannot
        // flatten into a fixed feature vector — loud failure.
        s match {
          case f: Flat => f
          case Pooled(ch) => Flat(ch)
          case other => sys.error(s"${m.fqName} on a variable-length sequence " +
            s"($other): pool before flattening")
        }
      case "Sequential" | "ModuleList" =>
        // code-backed container if its (mangled) class was serialized;
        // else registration order IS execution order for Sequential
        classes.get(m.fqName) match {
          case Some(cd) => interpret(cd, m, s)
          case None =>
            var cur = s
            for ((_, v) <- m.attrs) v match {
              case sub: ModuleNode => cur = applyModule(sub, cur)
              case _ => // training flag etc.
            }
            cur
        }
      case other => sys.error(s"unsupported TorchScript op: ${m.fqName} " +
        "(builtin torch.nn surface: Linear, Embedding, EmbeddingBag, Conv1d, " +
        "Conv2d, MaxPool1d, AvgPool1d, MaxPool2d, AvgPool2d, AdaptiveMaxPool1d, " +
        "AdaptiveAvgPool1d, AdaptiveMaxPool2d, AdaptiveAvgPool2d, GRU, LSTM, " +
        "ReLU, Sigmoid, Tanh, GELU, SiLU, LeakyReLU, ELU, Hardtanh, Softplus, " +
        "Softmax, LogSoftmax, BatchNorm1d, BatchNorm2d, LayerNorm, RMSNorm, " +
        "GLU, Identity, Dropout, Flatten, Sequential)")
    }

    /** Execute a parsed forward body with `self = m`, input shape `in`
      * (plus the encoder-side input for the two-tensor root forward). */
    private def interpret(cd: ClassDef, m: ModuleNode, in: Sym,
        in2: Option[Sym] = None): Sym = {
      val env = mutable.Map[String, Any](cd.paramName -> in)
      (cd.paramName2, in2) match {
        case (Some(p2), Some(v2)) => env(p2) = v2
        case (Some(p2), None) => sys.error(s"TorchScript code: ${cd.fqName} " +
          s"takes two tensors ($p2 unbound) but was applied as a single-input " +
          "submodule — only the root forward may take two inputs")
        case (None, Some(_)) =>
          sys.error(s"TorchScript code: ${cd.fqName} single-tensor forward given two inputs")
        case _ =>
      }
      def eval(e: Expr, line: String): Any = e match {
        case EName(n) => env.getOrElse(n,
          sys.error(s"TorchScript code: unbound name $n in: $line"))
        case ESelfAttr(a) => m.attrs.getOrElse(a,
          sys.error(s"TorchScript code: ${m.fqName} has no attr $a in: $line"))
        case ELit(v) => v
        case EList(items) => items.map(eval(_, line))
        case EForward(t, as) =>
          val mod = eval(t, line) match {
            case mn: ModuleNode => mn
            case other => sys.error(s"TorchScript code: .forward on non-module $other in: $line")
          }
          if (mod.simpleName == "MultiheadAttention")
            applyMha(mod, as.map(a => eval(a, line)), line)
          else {
            if (as.length != 1) sys.error(s"TorchScript code: .forward with " +
              s"${as.length} args on ${mod.simpleName} (single tensor only) in: $line")
            val d = eval(as.head, line) match {
              case sy: Sym => sy
              case other => sys.error(s"TorchScript code: .forward on non-tensor $other in: $line")
            }
            applyModule(mod, d)
          }
        case EFnCall(qual, args) =>
          val fn = qual.substring(qual.lastIndexOf('.') + 1)
          def tensorArg: Sym = eval(args.head, line) match {
            case sy: Sym => sy
            case other => sys.error(s"TorchScript code: $fn on non-tensor $other in: $line")
          }
          def flat(sy: Sym): Sym = sy match {
            case f: Flat => f
            case other => sys.error(s"TorchScript code: $fn on an unpooled sequence " +
              s"($other) unsupported in: $line")
          }
          /** A size argument that generated code writes as `2` or `[2]`. */
          def sizeArg(i: Int, dflt: Long): Long = args.lift(i).map(a => eval(a, line)) match {
            case None | Some(null) => dflt
            case Some(n: Long) => n
            case Some(Vector(n: Long)) => n
            case Some(Vector()) => dflt // e.g. stride=[] -> default
            case other => sys.error(s"TorchScript code: $fn arg $i = $other unsupported in: $line")
          }
          fn match {
            // evaluate the tensor arg FIRST: its sub-calls (e.g. the
            // nested Linear forward) must emit their ops before this one
            case "relu" | "sigmoid" | "tanh" | "gelu" | "silu" =>
              // extends a held image pipe / starts a held FFN half /
              // materializes-and-emits, per the live shape
              elemAct(ActOp(fn), tensorArg)
            case "softmax" | "log_softmax" =>
              tensorArg match {
                case sc: AttnScores =>
                  // row-softmax of the (n, seq, seq) score matrix: the
                  // middle of the attention pattern — no op emitted yet
                  require(fn == "softmax",
                    s"TorchScript code: $fn on attention scores unsupported in: $line")
                  args.lift(1).map(a => eval(a, line)) match {
                    case None | Some(-1L) | Some(2L) | Some(null) =>
                    case other => sys.error(s"TorchScript code: $fn over dim $other " +
                      s"unsupported on attention scores (last dim only) in: $line")
                  }
                  AttnWeights(sc.q, sc.k, sc.scale, sc.causal, sc.bias, sc.rope)
                case sc: CrossScores =>
                  require(fn == "softmax",
                    s"TorchScript code: $fn on cross-attention scores unsupported in: $line")
                  args.lift(1).map(a => eval(a, line)) match {
                    case None | Some(-1L) | Some(2L) | Some(null) =>
                    case other => sys.error(s"TorchScript code: $fn over dim $other " +
                      s"unsupported on attention scores (last dim only) in: $line")
                  }
                  CrossWeights(sc.q, sc.k, sc.scale)
                case sy0 =>
                  val sy = flat(sy0)
                  args.lift(1).map(a => eval(a, line)) match {
                    case None | Some(-1L) | Some(1L) | Some(null) =>
                    case other => sys.error(s"TorchScript code: $fn over dim $other unsupported in: $line")
                  }
                  ops += SoftmaxOp(log = fn == "log_softmax")
                  sy
              }
            case "matmul" | "bmm" =>
              // only the two matmuls of a self-attention block have a
              // home in the linear op chain (see Sym.SeqProj)
              require(args.length >= 2, s"TorchScript code: $fn needs 2 args in: $line")
              (eval(args(0), line), eval(args(1), line)) match {
                case (q: SeqProj, kt: SeqProjT) =>
                  require(q.l.outDim == kt.p.l.outDim,
                    s"TorchScript code: matmul(q, k^T) with head dims " +
                      s"${q.l.outDim} vs ${kt.p.l.outDim} in: $line")
                  AttnScores(q, kt.p, 1.0)
                case (q: RopedProj, kt: RopedProjT) =>
                  // RoPE attention: BOTH legs rotated with the SAME
                  // cos/sin tables (reference-equal slices, or two
                  // slices of identical buffers)
                  val k = kt.rp
                  require(q.p.l.outDim == k.p.l.outDim,
                    s"TorchScript code: matmul(rope(q), rope(k)^T) with head " +
                      s"dims ${q.p.l.outDim} vs ${k.p.l.outDim} in: $line")
                  def same(a: BufSlice, b: BufSlice): Boolean =
                    (a eq b) || ((a.rows == b.rows) && (a.cols == b.cols) &&
                      java.util.Arrays.equals(a.weight, b.weight))
                  require(same(q.cos, k.cos) && same(q.sin, k.sin),
                    s"TorchScript code: q and k rotated with different " +
                      s"cos/sin tables in: $line")
                  AttnScores(q.p, k.p, 1.0, rope = Some((q.cos, q.sin)))
                case (_: RopedProj, _: SeqProjT) | (_: SeqProj, _: RopedProjT) =>
                  sys.error(s"TorchScript code: RoPE must rotate BOTH q and k " +
                    s"(one leg rotated, one plain) in: $line")
                case (q: SeqProj, EncSide(kt: SeqProjT)) =>
                  // hand-rolled CROSS attention: query projection over
                  // the main stream, key projection over the encoder
                  // stream — the T5/BART decoder pattern
                  require(q.l.outDim == kt.p.l.outDim,
                    s"TorchScript code: matmul(q, k_enc^T) with head dims " +
                      s"${q.l.outDim} vs ${kt.p.l.outDim} in: $line")
                  require(q.l.inDim == kt.p.l.inDim,
                    s"TorchScript code: cross-attention needs equal main/encoder " +
                      s"widths (${q.l.inDim} vs ${kt.p.l.inDim}) in: $line")
                  CrossScores(q, kt.p, 1.0)
                case (cw: CrossWeights, EncSide(v: SeqProj)) =>
                  val (q, k) = (cw.q.l, cw.k.l)
                  require(v.l.outDim == q.outDim && v.l.inDim == k.inDim &&
                      k.inDim == q.inDim,
                    s"TorchScript code: cross-attention legs disagree (q ${q.inDim}->" +
                      s"${q.outDim}, k ${k.inDim}->${k.outDim}, v ${v.l.inDim}->" +
                      s"${v.l.outDim}) in: $line")
                  // the encoder leg is consumed: freeze it (every cross
                  // op shares ONE per-row encoder output)
                  encConsumed = true
                  CrossAttnOut(Vector(SelfAttentionOp(q.weight, q.bias, k.weight, k.bias,
                    v.l.weight, v.l.bias, dim = v.l.outDim, inDim = v.l.inDim,
                    scale = cw.scale)), None)
                case (_: CrossWeights, _: SeqProj) =>
                  sys.error(s"TorchScript code: cross-attention weights applied to " +
                    s"a MAIN-stream value projection (v must come from the encoder " +
                    s"sequence, like k) in: $line")
                case (_: AttnWeights, EncSide(_)) =>
                  sys.error(s"TorchScript code: self-attention weights applied to " +
                    s"an ENCODER-stream value (q and k were main-stream) in: $line")
                case (aw: AttnWeights, v: SeqProj) =>
                  val (q, k) = (aw.q.l, aw.k.l)
                  require(v.l.outDim == q.outDim && v.l.inDim == q.inDim &&
                      k.inDim == q.inDim,
                    s"TorchScript code: attention legs disagree (q ${q.inDim}->" +
                      s"${q.outDim}, k ${k.inDim}->${k.outDim}, v ${v.l.inDim}->" +
                      s"${v.l.outDim}) in: $line")
                  aw.rope.foreach { case (c, s0) =>
                    require(c.cols == q.outDim && s0.cols == q.outDim &&
                        c.rows == s0.rows,
                      s"TorchScript code: RoPE tables (${c.rows}x${c.cols}, " +
                        s"${s0.rows}x${s0.cols}) vs head dim ${q.outDim} in: $line")
                  }
                  // HELD: cat/proj/residual may still fuse (see AttnOut)
                  AttnOut(Vector(SelfAttentionOp(q.weight, q.bias, k.weight, k.bias,
                    v.l.weight, v.l.bias, dim = v.l.outDim, inDim = v.l.inDim,
                    scale = aw.scale, causal = aw.causal,
                    bias = aw.bias.map(_.weight),
                    biasRows = aw.bias.map(_.rows).getOrElse(0),
                    ropeCos = aw.rope.map(_._1.weight),
                    ropeSin = aw.rope.map(_._2.weight),
                    ropeLen = aw.rope.map(_._1.rows).getOrElse(0))), None)
                case (x, y) => sys.error(s"TorchScript code: $fn on (${x.getClass.getSimpleName}, " +
                  s"${y.getClass.getSimpleName}) unsupported (self-attention pattern only) in: $line")
              }
            case "div" | "mul" =>
              // scalar scaling of attention scores (q·k^T / sqrt(d)),
              // or a leg of the masked-mean read-out:
              // mul(x, validMask.unsqueeze(-1)) zeroes pad positions,
              // div(sum(x·mask, 1), lengths) closes the pattern and
              // emits SeqMaskedMeanPoolOp (padded-batch mode)
              (eval(args(0), line), eval(args(1), line)) match {
                case (sc: AttnScores, c0) =>
                  val c = c0 match {
                    case d: Double => d
                    case n: Long => n.toDouble
                    case other => sys.error(s"TorchScript code: $fn by non-scalar $other in: $line")
                  }
                  require(c != 0.0 || fn == "mul", s"TorchScript code: div by zero in: $line")
                  // a bias summed in BEFORE the scaling ((q·kᵀ + mask)/c)
                  // scales along with the scores; c > 0 keeps -inf
                  // entries -inf (a sign flip would turn them +inf)
                  require(sc.bias.isEmpty || c > 0.0,
                    s"TorchScript code: $fn of masked scores by non-positive " +
                      s"$c in: $line")
                  def sc1(v: Double): Double = if (fn == "div") v / c else v * c
                  sc.copy(scale = sc1(sc.scale),
                    bias = sc.bias.map(b =>
                      b.copy(weight = b.weight.map(v => sc1(v.toDouble).toFloat))))
                case (sc: CrossScores, c0) =>
                  val c = c0 match {
                    case d: Double => d
                    case n: Long => n.toDouble
                    case other => sys.error(s"TorchScript code: $fn by non-scalar $other in: $line")
                  }
                  require(c != 0.0 || fn == "mul", s"TorchScript code: div by zero in: $line")
                  sc.copy(scale = if (fn == "div") sc.scale / c else sc.scale * c)
                case (num: MaskedSum, den: LenVec) if fn == "div" =>
                  require(num.padId == den.padId,
                    s"TorchScript code: masked-mean numerator (pad ${num.padId}) " +
                      s"divided by lengths of pad ${den.padId} in: $line")
                  require(padMaskId < 0 || padMaskId == num.padId,
                    s"TorchScript code: conflicting key_padding_mask pad ids " +
                      s"($padMaskId vs ${num.padId}) in: $line")
                  padMaskId = num.padId
                  ops += SeqMaskedMeanPoolOp
                  Flat(num.emb)
                case (p: SeqProj, b: BufSlice) if fn == "mul" && b.dims == 1 =>
                  // q * self.cos[:L] — one leg of the RoPE recombination
                  require(b.cols == p.l.outDim, s"TorchScript code: " +
                    s"(L, ${b.cols}) table multiplied into a ${p.l.outDim}-dim " +
                    s"projection in: $line")
                  BufScaledSeq(p, rotated = false, b)
                case (b: BufSlice, p: SeqProj) if fn == "mul" && b.dims == 1 =>
                  require(b.cols == p.l.outDim, s"TorchScript code: " +
                    s"(L, ${b.cols}) table multiplied into a ${p.l.outDim}-dim " +
                    s"projection in: $line")
                  BufScaledSeq(p, rotated = false, b)
                case (r: RotHalfSeq, b: BufSlice) if fn == "mul" && b.dims == 1 =>
                  // rotate_half(q) * self.sin[:L] — the other leg
                  require(b.cols == r.p.l.outDim, s"TorchScript code: " +
                    s"(L, ${b.cols}) table multiplied into a ${r.p.l.outDim}-dim " +
                    s"rotated projection in: $line")
                  BufScaledSeq(r.p, rotated = true, b)
                case (b: BufSlice, r: RotHalfSeq) if fn == "mul" && b.dims == 1 =>
                  require(b.cols == r.p.l.outDim, s"TorchScript code: " +
                    s"(L, ${b.cols}) table multiplied into a ${r.p.l.outDim}-dim " +
                    s"rotated projection in: $line")
                  BufScaledSeq(r.p, rotated = true, b)
                case (x, m: ValidMask) if fn == "mul" =>
                  require(m.asFloat && m.unsqueezed, s"TorchScript code: mul by a " +
                    s"bool/unbroadcastable valid mask (cast with .to(float) and " +
                    s".unsqueeze(-1) first) in: $line")
                  x match {
                    case sy: Sym => forceSeq(sy) match {
                      case SeqEmb(d) => MaskedSeq(d, m.padId)
                      case other => sys.error(s"TorchScript code: masked-mean mul on " +
                        s"$other unsupported ((n, seq, emb) sequences only) in: $line")
                    }
                    case other => sys.error(s"TorchScript code: mul of $other by a " +
                      s"valid mask unsupported in: $line")
                  }
                case (m: ValidMask, x: Sym) if fn == "mul" =>
                  require(m.asFloat && m.unsqueezed, s"TorchScript code: mul by a " +
                    s"bool/unbroadcastable valid mask (cast with .to(float) and " +
                    s".unsqueeze(-1) first) in: $line")
                  forceSeq(x) match {
                    case SeqEmb(d) => MaskedSeq(d, m.padId)
                    case other => sys.error(s"TorchScript code: masked-mean mul on " +
                      s"$other unsupported ((n, seq, emb) sequences only) in: $line")
                  }
                case (x, y) => sys.error(s"TorchScript code: $fn on " +
                  s"(${x.getClass.getSimpleName}, ${y.getClass.getSimpleName}) " +
                  s"unsupported (attention-score scaling / masked mean only) in: $line")
              }
            case "add" =>
              // the residual connection of an encoder block: one side is
              // the live (n, seq, d) sequence, the other a HELD
              // attention/FFN output over that same sequence (the only
              // (n, seq, d) producers in this restricted language) —
              // fused into the block op. alpha (arg 3) must be 1.
              require(args.length >= 2, s"TorchScript code: add needs 2 args in: $line")
              args.lift(2).map(a => eval(a, line)) match {
                case None | Some(1L) | Some(null) =>
                case other => sys.error(s"TorchScript code: add alpha $other unsupported in: $line")
              }
              val (x, y) = (eval(args(0), line), eval(args(1), line))
              def fuse(live: Sym, held: Sym): Sym = (live, held) match {
                case (SeqEmb(d), p: PosEmbSeq) =>
                  // x + pos_emb(arange(L)): the learned position signal
                  require(p.emb == d,
                    s"TorchScript code: $d-dim sequence + ${p.emb}-dim " +
                      s"positional embeddings in: $line")
                  ops += PosEmbedOp(p.weight, p.maxLen, p.emb)
                  SeqEmb(d)
                case (SeqEmb(d), b: BufSlice) if b.dims == 1 =>
                  // x + self.pe[:L]: a PRECOMPUTED positional-encoding
                  // buffer (the sinusoidal-PE serialized shape) — same
                  // runtime op as the learned-position path
                  require(b.cols == d,
                    s"TorchScript code: $d-dim sequence + ${b.cols}-dim " +
                      s"positional-encoding buffer in: $line")
                  ops += PosEmbedOp(b.weight, b.rows, b.cols)
                  SeqEmb(d)
                case (sc: AttnScores, b: BufSlice) if b.dims == 2 =>
                  // scores + self.mask[:L, :L]: an exactly-causal buffer
                  // (classified at slice time) sets the causal flag —
                  // the GPT-decoder pattern; any other content is the
                  // general additive bias (ALiBi / banded windows)
                  require(!sc.causal && sc.bias.isEmpty,
                    s"TorchScript code: attention mask added twice in: $line")
                  if (b.causalMask) sc.copy(causal = true)
                  else sc.copy(bias = Some(b))
                case (SeqEmb(d), a: AttnOut) =>
                  val op = EncoderAttnOp(a.heads, a.proj, residual = true)
                  require(op.inDim == d,
                    s"TorchScript code: residual over $d-dim sequence vs " +
                      s"attention on ${op.inDim} in: $line")
                  ops += op
                  SeqEmb(op.outDim)
                case (SeqEmb(d), c: CrossAttnOut) =>
                  // the decoder-block residual: x + cross_attn(x, enc)
                  val op = CrossAttnOp(c.heads, c.proj, residual = true)
                  require(op.inDim == d,
                    s"TorchScript code: residual over $d-dim sequence vs " +
                      s"cross-attention on ${op.inDim} in: $line")
                  ops += op
                  SeqEmb(op.outDim)
                case (SeqEmb(d), f: FfnOut) =>
                  require(f.l1.inDim == d && f.l2.outDim == d,
                    s"TorchScript code: residual over $d-dim sequence vs " +
                      s"FFN ${f.l1.inDim}->${f.l2.outDim} in: $line")
                  ops += PosFfnOp(f.l1, f.act, f.l2, residual = true)
                  SeqEmb(d)
                case (ChanHW(c), ip: ImgPipe) =>
                  // the ResNet basic block: x + stages(x); shape
                  // preservation validated by the op's constructor
                  require(ip.inCh == c && ip.outCh == c,
                    s"TorchScript code: residual over $c channels vs pipe " +
                      s"${ip.inCh}->${ip.outCh} in: $line")
                  ops += ResBlock2dOp(ip.stages)
                  ChanHW(c)
                case (a: BufScaledSeq, b: BufScaledSeq)
                    if !a.rotated && b.rotated =>
                  // x·cos + rotate_half(x)·sin: the RoPE recombination
                  // closes — the projection leg is now rotary-embedded
                  require(a.p eq b.p, s"TorchScript code: RoPE legs come " +
                    s"from different projections in: $line")
                  require(a.buf.rows == b.buf.rows,
                    s"TorchScript code: cos (${a.buf.rows} rows) and sin " +
                      s"(${b.buf.rows} rows) tables disagree in: $line")
                  RopedProj(a.p, cos = a.buf, sin = b.buf)
                case _ => null
              }
              val fused = (x, y) match {
                case (a: Sym, b: Sym) => Option(fuse(a, b)).orElse(Option(fuse(b, a)))
                case _ => None
              }
              fused.getOrElse(sys.error(s"TorchScript code: add on " +
                s"(${x.getClass.getSimpleName}, ${y.getClass.getSimpleName}) unsupported " +
                s"(encoder-block residual only) in: $line"))
            case "cat" =>
              // torch.cat([o1, o2, ...], -1): merge per-head attention
              // outputs on the feature dim — the hand-rolled multi-head
              // pattern; stays held for out-proj / residual fusion.
              // torch.cat([h_n[-2], h_n[-1]], 1): re-join the two
              // directions of a bidirectional RNN read-out -> (n, 2H).
              val items = eval(args(0), line) match {
                case v: Vector[_] => v
                case other => sys.error(s"TorchScript code: cat on non-list $other in: $line")
              }
              def featureDim(extra: Set[Long]): Unit =
                args.lift(1).map(a => eval(a, line)) match {
                  case None | Some(-1L) | Some(null) =>
                  case Some(d: Long) if extra(d) =>
                  case other => sys.error(s"TorchScript code: cat over dim $other " +
                    s"unsupported (feature dim only) in: $line")
                }
              items match {
                case Vector(RnnDirTop(hf, true), RnnDirTop(hb, false)) if hf eq hb =>
                  featureDim(Set(1L)) // (n, H) pair: feature dim is 1
                  ops += hf.op
                  Flat(2 * hf.hidden)
                case Vector(RnnDirTop(_, a0), RnnDirTop(_, b0)) =>
                  sys.error(s"TorchScript code: cat of bidirectional RNN selects " +
                    s"must be (h_n[-2], h_n[-1]) of ONE rnn (got fwd=$a0, fwd=$b0) in: $line")
                case Vector(NegFeatHalf(FeatHalf(p2, true, h2)), FeatHalf(p1, false, h1)) =>
                  // cat([-x2, x1], -1): rotate_half of ONE held projection
                  featureDim(Set(2L))
                  require((p2 eq p1) && h1 == h2,
                    s"TorchScript code: rotate_half halves come from different " +
                      s"projections in: $line")
                  RotHalfSeq(p1, h1)
                case Vector(_: FeatHalf | _: NegFeatHalf, _) |
                    Vector(_, _: FeatHalf | _: NegFeatHalf) =>
                  sys.error(s"TorchScript code: cat of projection halves must " +
                    s"be the rotate_half pattern cat([-x2, x1], -1) in: $line")
                case _ if items.nonEmpty && items.forall {
                    case CrossAttnOut(Vector(_), None) => true
                    case _ => false
                  } =>
                  // merge hand-rolled CROSS-attention heads on the
                  // feature dim (stays held for out-proj / residual)
                  featureDim(Set(2L))
                  CrossAttnOut(items.map(
                    _.asInstanceOf[CrossAttnOut].heads.head).toVector, None)
                case _ =>
                  featureDim(Set(2L)) // (n, L, d) heads: feature dim is 2
                  val heads = items.map {
                    case AttnOut(Vector(h), None) => h
                    case other => sys.error(s"TorchScript code: cat of $other unsupported " +
                      s"(unprojected single-head attention outputs only) in: $line")
                  }
                  require(heads.nonEmpty, s"TorchScript code: cat of empty list in: $line")
                  AttnOut(heads.toVector, None)
              }
            case "mean" =>
              // the (n, seq, emb) -> (n, emb) position pool — after the
              // embedding (fused back to EmbeddingMeanOp at load), after
              // a materialized attention/FFN block, or over an RNN's
              // full output sequence (out.mean(1), the sentence-encoder
              // read-out — fused into the RnnOp as seqPool)
              def meanArgs(): Unit = {
                args.lift(1).map(a => eval(a, line)) match {
                  case Some(1L) | Some(Vector(1L)) =>
                  case other => sys.error(s"TorchScript code: mean over dims $other " +
                    s"unsupported (dim=1 only) in: $line")
                }
                args.lift(2).map(a => eval(a, line)) match {
                  case None | Some(false) | Some(null) => // keepdim=False
                  case other => sys.error(s"TorchScript code: mean keepdim $other unsupported in: $line")
                }
              }
              tensorArg match {
                case RnnOutSeq(h, _) =>
                  meanArgs()
                  ops += h.op.copy(seqPool = Some("mean"))
                  Flat(h.hidden * h.dirs)
                case sy0 =>
                  val emb = forceSeq(sy0) match {
                    case SeqEmb(e) => e
                    case other => sys.error(s"TorchScript code: mean on $other " +
                      s"unsupported (sequence tensors only) in: $line")
                  }
                  meanArgs()
                  ops += SeqMeanPoolOp
                  Flat(emb)
              }
            case "transpose" =>
              // torch.transpose(x, 1, 2): the layout flip between the
              // embedding sequence and Conv1d's channel-major input.
              // On a 3-D (n, seq, d) tensor, (-2, -1) names the same
              // pair of dims — the spelling attention code uses for K^T.
              val sy = tensorArg
              val dims = (sizeArg(1, -1), sizeArg(2, -1))
              val lastTwo = Set((1L, 2L), (2L, 1L), (-2L, -1L), (-1L, -2L))
              require(lastTwo(dims),
                s"TorchScript code: transpose over dims $dims unsupported (last two only) in: $line")
              forceSeq(sy) match {
                case p: SeqProj => SeqProjT(p) // K^T leg: no op emitted
                case rp: RopedProj => RopedProjT(rp) // rotated K^T leg
                case EncSide(p: SeqProj) => EncSide(SeqProjT(p)) // cross K^T leg
                case SeqEmb(e) => ops += TransposeOp; ChanSeq(e)
                case ChanSeq(c) => ops += TransposeOp; SeqEmb(c)
                case other => sys.error(s"TorchScript code: transpose(1, 2) on " +
                  s"$other unsupported in: $line")
              }
            case "permute" =>
              // torch.permute(x, [0, 2, 1]) — same flip as transpose(1, 2)
              val sy = tensorArg
              args.lift(1).map(a => eval(a, line)) match {
                case Some(Vector(0L, 2L, 1L)) =>
                case other => sys.error(s"TorchScript code: permute $other " +
                  s"unsupported ([0, 2, 1] only) in: $line")
              }
              ops += TransposeOp
              sy match {
                case SeqEmb(e) => ChanSeq(e)
                case ChanSeq(c) => SeqEmb(c)
                case other => sys.error(s"TorchScript code: permute on $other " +
                  s"unsupported in: $line")
              }
            case "max_pool1d" =>
              val sy = tensorArg match {
                case cs: ChanSeq => cs
                case other => sys.error(s"TorchScript code: max_pool1d on $other " +
                  s"(needs (n, ch, seq)) in: $line")
              }
              val k = sizeArg(1, -1)
              require(k >= 1, s"TorchScript code: max_pool1d kernel missing in: $line")
              val stride = sizeArg(2, k)
              require(sizeArg(3, 0) == 0, s"TorchScript code: max_pool1d padding unsupported in: $line")
              require(sizeArg(4, 1) == 1, s"TorchScript code: max_pool1d dilation unsupported in: $line")
              args.lift(5).map(a => eval(a, line)) match {
                case None | Some(false) | Some(null) =>
                case other => sys.error(s"TorchScript code: max_pool1d ceil_mode $other unsupported in: $line")
              }
              ops += MaxPool1dOp(k.toInt, stride.toInt)
              sy
            case "adaptive_max_pool1d" | "adaptive_avg_pool1d" =>
              val ch = tensorArg match {
                case ChanSeq(c) => c
                case other => sys.error(s"TorchScript code: $fn on $other " +
                  s"(needs (n, ch, seq)) in: $line")
              }
              require(sizeArg(1, -1) == 1,
                s"TorchScript code: $fn output_size != 1 unsupported in: $line")
              ops += (if (fn == "adaptive_max_pool1d") SeqMaxPoolOp else SeqAvgPoolOp)
              Pooled(ch)
            case "flatten" =>
              // torch.flatten(x, 1): (n, ch, 1) -> (n, ch); identity on
              // flat input; a variable-length sequence cannot flatten
              tensorArg match {
                case f: Flat => f
                case Pooled(ch) => Flat(ch)
                case other => sys.error(s"TorchScript code: flatten on a " +
                  s"variable-length sequence ($other) in: $line")
              }
            case "squeeze" =>
              // torch.squeeze(x[, 2 | -1]): drops the pooled length-1 dim;
              // torch.squeeze(h_n[, 0]): drops an RNN h_n's num_layers dim
              tensorArg match {
                case f: Flat => f // no size-1 dim: identity
                case Pooled(ch) =>
                  args.lift(1).map(a => eval(a, line)) match {
                    case None | Some(2L) | Some(-1L) =>
                    case other => sys.error(s"TorchScript code: squeeze dim $other " +
                      s"unsupported in: $line")
                  }
                  Flat(ch)
                case h: RnnHidden =>
                  args.lift(1).map(a => eval(a, line)) match {
                    case None | Some(0L) => // (1, n, H) -> (n, H)
                    case other => sys.error(s"TorchScript code: squeeze dim $other " +
                      s"on an RNN hidden state unsupported (num_layers dim 0 only) in: $line")
                  }
                  // torch.squeeze(h_n, 0) only drops a SIZE-1 dim: on a
                  // stacked or bidirectional RNN it is a no-op and the
                  // downstream fc would see (k·dirs, n, H) — reject
                  // exactly as torch would
                  require(h.layers == 1 && h.dirs == 1,
                    s"TorchScript code: squeeze(0) on a ${h.layers}-layer " +
                      s"${h.dirs}-direction h_n is a no-op (classifiers read " +
                      s"h_n[-1], bidirectional ones cat(h_n[-2], h_n[-1])) in: $line")
                  ops += h.op
                  Flat(h.hidden)
                case other => sys.error(s"TorchScript code: squeeze on $other " +
                  s"unsupported in: $line")
              }
            case "select" =>
              // torch.select(h_n, 0, -1): the last (= only) layer of an
              // RNN hidden state — equivalent to squeeze(0) for 1 layer.
              // torch.select(x, 1, 0): CLS pooling — position 0 of the
              // live (n, seq, emb) sequence (the x[:, 0] read-out)
              tensorArg match {
                case h: RnnHidden if h.dirs == 2 =>
                  // bidirectional h_n rows are [l0_fwd, l0_bwd, …,
                  // ltop_fwd, ltop_bwd]: h_n[-2] = forward top layer,
                  // h_n[-1] = reverse top layer — held for the cat
                  (sizeArg(1, Long.MinValue), sizeArg(2, Long.MinValue)) match {
                    case (0L, -2L) => RnnDirTop(h, fwd = true)
                    case (0L, -1L) => RnnDirTop(h, fwd = false)
                    case other => sys.error(s"TorchScript code: select $other on a " +
                      s"bidirectional RNN hidden state unsupported ((0, -2) fwd / " +
                      s"(0, -1) bwd only) in: $line")
                  }
                case h: RnnHidden =>
                  (sizeArg(1, Long.MinValue), sizeArg(2, Long.MinValue)) match {
                    case (0L, -1L) => // top layer: the classifier read-out
                    case (0L, 0L) =>
                      require(h.layers == 1, s"TorchScript code: h_n[0] of a " +
                        s"${h.layers}-layer RNN reads the BOTTOM layer " +
                        s"(classifiers read h_n[-1]) in: $line")
                    case other => sys.error(s"TorchScript code: select $other on an " +
                      s"RNN hidden state unsupported ((0, 0) / (0, -1) only) in: $line")
                  }
                  ops += h.op
                  Flat(h.hidden)
                case sy0 => forceSeq(sy0) match {
                  case SeqEmb(e) =>
                    (sizeArg(1, Long.MinValue), sizeArg(2, Long.MinValue)) match {
                      case (1L, 0L) => ops += SeqClsPoolOp // x[:, 0]: CLS read-out
                      case (1L, -1L) => ops += SeqLastPoolOp // x[:, -1]: decoder read-out
                      case other => sys.error(s"TorchScript code: select $other on a " +
                        s"sequence unsupported ((1, 0) CLS / (1, -1) last-token only) in: $line")
                    }
                    Flat(e)
                  case other => sys.error(s"TorchScript code: select on $other " +
                    s"unsupported in: $line")
                }
              }
            case "size" =>
              // torch.size(x, 1): the dynamic sequence length — only
              // meaningful as arange's input (position-id ramp)
              tensorArg match {
                case SeqEmb(_) =>
                  sizeArg(1, Long.MinValue) match {
                    case 0L => BatchLen
                    case 1L => SeqLen
                    case d => sys.error(s"TorchScript code: size over dim $d " +
                      s"unsupported (batch 0 / sequence 1 only) in: $line")
                  }
                case other => sys.error(s"TorchScript code: size on $other " +
                  s"unsupported (live sequences only) in: $line")
              }
            case "arange" =>
              // torch.arange(size(x, 1)[, dtype/device/...]): the
              // position-id ramp; trailing None args are torch.jit's
              // serialized dtype/layout/device defaults
              eval(args.head, line) match {
                case SeqLen =>
                  require(args.tail.forall(a => eval(a, line) == null),
                    s"TorchScript code: arange with non-default dtype/device in: $line")
                  PosIds
                case other => sys.error(s"TorchScript code: arange over $other " +
                  s"unsupported (size(x, 1) only) in: $line")
              }
            case "slice" =>
              // torch.slice(t, dim, 0, L, 1): the serialized form of
              // `t[:L]` / `t[:L, :L]` on a registered buffer — a
              // positional-encoding table (one slice) or an additive
              // attention mask (two slices) — OR, on the live
              // channel-major sequence, `x[:, :, :-n]`: the Chomp1d
              // trim of a symmetric-pad causal conv (locuslab TCN).
              val sliced = eval(args.head, line)
              def sliceRest(): Sym = {
              sliced match {
                case _: ChanSeq =>
                case _ =>
                  args.lift(3).map(a => eval(a, line)) match {
                    case Some(SeqLen) =>
                    case other => sys.error(s"TorchScript code: slice end $other " +
                      s"unsupported (the live size(x, 1) only) in: $line")
                  }
              }
              require(sizeArg(2, 0) == 0,
                s"TorchScript code: slice start != 0 unsupported in: $line")
              require(sizeArg(4, 1) == 1,
                s"TorchScript code: slice step != 1 unsupported in: $line")
              val sliceDim = sizeArg(1, 0)
              sliced match {
                case cs: ChanSeq =>
                  require(sliceDim == 2, s"TorchScript code: live-tensor " +
                    s"slice over dim $sliceDim unsupported (dim 2 only) in: $line")
                  val end = sizeArg(3, 0)
                  require(end < 0, s"TorchScript code: live-tensor slice end " +
                    s"$end unsupported (negative chomp `x[:, :, :-n]` only) in: $line")
                  ops += Chomp1dOp((-end).toInt)
                  cs
                case t: Pickle.PTensor =>
                  require(sliceDim == 0, s"TorchScript code: first buffer slice " +
                    s"over dim $sliceDim unsupported (dim 0 only) in: $line")
                  require(t.shape.length == 2, s"TorchScript code: sliced buffer " +
                    s"must be 2-D (got ${t.shape.length}-D) in: $line")
                  BufSlice(materialize(t), t.shape(0), t.shape(1), 1)
                case b: BufSlice if b.dims == 1 =>
                  require(sliceDim == 1, s"TorchScript code: second buffer slice " +
                    s"over dim $sliceDim unsupported (dim 1 only) in: $line")
                  require(b.rows == b.cols, s"TorchScript code: a two-dim-sliced " +
                    s"buffer must be square (${b.rows}x${b.cols}) in: $line")
                  // a square two-dim slice is only meaningful as an additive
                  // attention mask — classify its full content NOW so the
                  // add-fusion can trust it: exactly-causal (0 on/below the
                  // diagonal, -inf above) becomes the causal flag; anything
                  // else is a general bias, whose entries must be finite or
                  // -inf (a NaN / +inf mask has no softmax meaning)
                  var causalPat = true
                  var i = 0
                  while (i < b.rows) {
                    var j = 0
                    while (j < b.cols) {
                      val v = b.weight(i * b.cols + j)
                      require(!v.isNaN && v < Float.PositiveInfinity,
                        s"TorchScript code: sliced mask buffer entry ($i, $j) " +
                          s"= $v (additive attention masks must be finite or " +
                          s"-inf) in: $line")
                      if (if (j <= i) v != 0f else v != Float.NegativeInfinity)
                        causalPat = false
                      j += 1
                    }
                    i += 1
                  }
                  b.copy(dims = 2, causalMask = causalPat)
                case other => sys.error(s"TorchScript code: slice on $other " +
                  s"unsupported (registered 2-D buffers only) in: $line")
              }
              }
              sliced match {
                case p: SeqProj =>
                  // q[:, :, :h] / q[:, :, h:]: the feature-dim halves of
                  // a HELD projection — the RoPE rotate_half idiom (the
                  // hi half's end serializes as max-int64 or None)
                  require(sizeArg(1, 0) == 2, s"TorchScript code: slice of a " +
                    s"projection over dim ${sizeArg(1, 0)} unsupported (feature " +
                    s"dim 2 only) in: $line")
                  require(sizeArg(4, 1) == 1,
                    s"TorchScript code: slice step != 1 unsupported in: $line")
                  val d0 = p.l.outDim
                  require(d0 % 2 == 0, s"TorchScript code: rotate_half on an " +
                    s"odd head dim $d0 in: $line")
                  val h = d0 / 2
                  val start = sizeArg(2, 0)
                  val end = sizeArg(3, Long.MaxValue)
                  if (start == 0 && end == h) FeatHalf(p, hi = false, half = h)
                  else if (start == h && end >= d0) FeatHalf(p, hi = true, half = h)
                  else sys.error(s"TorchScript code: projection slice " +
                    s"[$start, $end) unsupported (the two rotate_half " +
                    s"halves of $d0 only) in: $line")
                case _ => sliceRest()
              }
            case "neg" =>
              // only the RoPE rotate_half's negated high half has a
              // home: cat([-x2, x1], -1)
              tensorArg match {
                case fh @ FeatHalf(_, true, _) => NegFeatHalf(fh)
                case other => sys.error(s"TorchScript code: neg on $other " +
                  s"unsupported (the rotate_half high half only) in: $line")
              }
            case "dropout" => tensorArg // eval-mode no-op on any shape
            case "eq" =>
              // torch.eq(x, pad) on the RAW token-ids input: the
              // key-padding mask of a padded batch (True AT pads).
              // eq on anything else has no home in the op-list model.
              require(tensorArg == Flat(-1), s"TorchScript code: eq on " +
                s"$tensorArg unsupported (key-padding eq reads the raw " +
                s"token-ids input) in: $line")
              eval(args(1), line) match {
                case p: Long =>
                  require(p >= 0, s"TorchScript code: eq pad id $p negative in: $line")
                  PadMask(p.toInt)
                case other => sys.error(s"TorchScript code: eq comparand " +
                  s"$other unsupported (int pad id only) in: $line")
              }
            case "ne" =>
              // torch.ne(x, pad) on the RAW token-ids input: the
              // valid-position mask of the masked-mean read-out
              require(tensorArg == Flat(-1), s"TorchScript code: ne on " +
                s"$tensorArg unsupported (valid-mask ne reads the raw " +
                s"token-ids input) in: $line")
              eval(args(1), line) match {
                case p: Long =>
                  require(p >= 0, s"TorchScript code: ne pad id $p negative in: $line")
                  ValidMask(p.toInt)
                case other => sys.error(s"TorchScript code: ne comparand " +
                  s"$other unsupported (int pad id only) in: $line")
              }
            case "logical_not" | "bitwise_not" | "__not__" =>
              // ~torch.eq(x, pad) == torch.ne(x, pad): flip between the
              // key-padding and valid-position masks
              tensorArg match {
                case PadMask(p) => ValidMask(p)
                case ValidMask(p, false, false) => PadMask(p)
                case other => sys.error(s"TorchScript code: $fn on $other " +
                  s"unsupported (raw pad/valid masks only) in: $line")
              }
            case "to" =>
              // dtype cast: only the bool->float cast of the valid mask
              // (the masked-mean multiplicand) has a home
              tensorArg match {
                case v @ ValidMask(_, false, false) => v.copy(asFloat = true)
                case other => sys.error(s"TorchScript code: to (dtype cast) on " +
                  s"$other unsupported (bool valid masks only) in: $line")
              }
            case "unsqueeze" =>
              // latent.unsqueeze(0): a (m, e) learned query parameter
              // gaining its batch dim on the way into the attention
              // pool; mask.unsqueeze(-1): broadcast the (n, L) float
              // mask over the feature dim; on summed lengths it only
              // reshapes
              eval(args.head, line) match {
                case t: Pickle.PTensor if t.shape.length == 2 =>
                  require(sizeArg(1, Long.MinValue) == 0L,
                    s"TorchScript code: unsqueeze on a raw parameter over dim " +
                      s"${sizeArg(1, Long.MinValue)} unsupported (0 only) in: $line")
                  LatentQ(materialize(t), t.shape(0).toInt, t.shape(1).toInt)
                case v @ ValidMask(_, true, false) =>
                  sizeArg(1, Long.MinValue) match {
                    case -1L | 2L => v.copy(unsqueezed = true)
                    case d => sys.error(s"TorchScript code: unsqueeze dim $d on a " +
                      s"valid mask unsupported (-1/2 only) in: $line")
                  }
                case l: LenVec =>
                  sizeArg(1, Long.MinValue) match {
                    case -1L | 1L => l
                    case d => sys.error(s"TorchScript code: unsqueeze dim $d on " +
                      s"lengths unsupported (-1/1 only) in: $line")
                  }
                case other => sys.error(s"TorchScript code: unsqueeze on $other " +
                  s"unsupported (masked-mean legs / latent queries only) in: $line")
              }
            case "expand" =>
              // latent.expand(b, -1, -1) (or a stored (1, m, e)
              // parameter expanded over the batch): shape-only on the
              // traced latent query array — torch requires the
              // explicit batch broadcast before nn.MultiheadAttention
              val base = eval(args.head, line) match {
                case lq: LatentQ => lq
                case t: Pickle.PTensor if t.shape.length == 3 && t.shape(0) == 1 =>
                  LatentQ(materialize(t), t.shape(1).toInt, t.shape(2).toInt)
                case other => sys.error(s"TorchScript code: expand on $other " +
                  s"unsupported (latent attention queries only) in: $line")
              }
              eval(args(1), line) match {
                case Seq(b, m0, e0) =>
                  require(b == BatchLen || b == -1L,
                    s"TorchScript code: expand batch dim $b unsupported " +
                      s"(size(x, 0) or -1 only) in: $line")
                  require(m0 == -1L || m0 == base.m.toLong,
                    s"TorchScript code: expand dim-1 $m0 != latent rows ${base.m} in: $line")
                  require(e0 == -1L || e0 == base.e.toLong,
                    s"TorchScript code: expand dim-2 $e0 != latent width ${base.e} in: $line")
                case other => sys.error(s"TorchScript code: expand dims $other " +
                  s"unsupported in: $line")
              }
              args.lift(2).map(a => eval(a, line)) match {
                case None | Some(_: Boolean) | Some(null) => // implicit flag
                case other => sys.error(s"TorchScript code: expand extra arg " +
                  s"$other unsupported in: $line")
              }
              base
            case "sum" =>
              // the two masked-mean sums: sum(x·mask, 1) -> numerator,
              // sum(floatMask, 1) -> per-row valid lengths
              def sumDim1(): Unit = {
                args.lift(1).map(a => eval(a, line)) match {
                  case Some(1L) | Some(Vector(1L)) =>
                  case other => sys.error(s"TorchScript code: sum over dims $other " +
                    s"unsupported (dim=1 only) in: $line")
                }
                args.lift(2).map(a => eval(a, line)) match {
                  case None | Some(_: Boolean) | Some(null) => // keepdim: shape only
                  case other => sys.error(s"TorchScript code: sum keepdim $other " +
                    s"unsupported in: $line")
                }
              }
              tensorArg match {
                case ValidMask(p, true, false) => sumDim1(); LenVec(p)
                case m: MaskedSeq => sumDim1(); MaskedSum(m.emb, m.padId)
                case other => sys.error(s"TorchScript code: sum on $other " +
                  s"unsupported (masked-mean legs only) in: $line")
              }
            case other => sys.error(s"TorchScript code: unsupported function $qual in: $line")
          }
      }
      var result: Option[Sym] = None
      for (st <- cd.body if result.isEmpty) {
        val v = eval(st.expr, st.line)
        st.lhs match {
          case Vector() => // return
            result = Some(v match {
              case sy: Sym => sy
              case other => sys.error(s"TorchScript code: non-tensor return $other in: ${st.line}")
            })
          case Vector(n) => env(n) = v
          case names => v match { // tuple unpack (out, hn, = _0)
            case STuple(items) if items.length == names.length =>
              names.zip(items).foreach { case (n, it) => env(n) = it }
            case STuple(items) => sys.error(s"TorchScript code: unpacking " +
              s"${names.length} names from a ${items.length}-tuple in: ${st.line}")
            case other => sys.error(s"TorchScript code: unpacking from " +
              s"non-tuple $other in: ${st.line}")
          }
        }
      }
      result.getOrElse(sys.error(s"TorchScript code: ${cd.fqName}.forward has no return"))
    }
  }
}
