package graft.torch

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipOutputStream}

/**
 * Test-side emitter of `torch.jit.save`-compatible archives (zip with
 * `data.pkl` + `data/<key>` storages + `byteorder` + `.py` code files),
 * byte-layout modeled on the reference archive
 * (/root/reference/model/iris.spt): protocol-2 pickle with GLOBAL,
 * NEWOBJ, BUILD, SETITEMS, BINPERSID and `_rebuild_tensor_v2` REDUCE —
 * no torch needed. Lets specs construct models with activations the
 * reference model doesn't use (Sigmoid/Tanh/Softmax/GELU), nested
 * Sequential, shared modules, and controlled weight constants.
 */
object SptFixture {

  sealed trait V
  final case class Tensor(shape: Seq[Int], data: Array[Float]) extends V
  final case class Module(fqcn: String, attrs: Seq[(String, V)]) extends V
  final case class I(n: Long) extends V
  final case class B(b: Boolean) extends V
  final case class F(d: Double) extends V
  final case class Str(s: String) extends V
  case object NoneV extends V
  /** Pickled tuple — conv/pool hyper-params serialize as 1-tuples. */
  final case class Tup(items: Seq[V]) extends V

  /** Write the archive; `code` maps archive-relative paths (e.g.
   * "code/__torch__.py") to generated-python text. */
  def write(root: String, model: Module, code: Map[String, String]): Array[Byte] = {
    val storages = Seq.newBuilder[(String, Array[Float])]
    var nextKey = 0

    val pkl = new ByteArrayOutputStream()
    def byte(b: Int): Unit = pkl.write(b)
    def str(s: String): Unit = { // SHORT_BINUNICODE
      val b = s.getBytes("UTF-8"); require(b.length < 256)
      byte(0x8c); byte(b.length); pkl.write(b)
    }
    def global(module: String, name: String): Unit = {
      byte('c'); pkl.write(s"$module\n$name\n".getBytes("UTF-8"))
    }
    def int(n: Long): Unit = { // BININT (fits our shapes/flags)
      byte('J')
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n.toInt)
      pkl.write(bb.array())
    }
    def emit(v: V): Unit = v match {
      case I(n) => int(n)
      case Str(s) => str(s)
      case B(b) => byte(if (b) 0x88 else 0x89)
      case F(d) => // BINFLOAT is big-endian
        byte('G')
        val bb = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(d)
        pkl.write(bb.array())
      case NoneV => byte('N')
      case Tup(items) =>
        byte('('); items.foreach(emit); byte('t')
      case Tensor(shape, data) =>
        require(shape.product == data.length, s"shape $shape vs ${data.length} values")
        val key = nextKey.toString; nextKey += 1
        storages += key -> data
        global("torch._utils", "_rebuild_tensor_v2")
        byte('(') // args tuple
        byte('(') // persistent id tuple
        str("storage"); global("torch", "FloatStorage"); str(key); str("cpu")
        int(data.length)
        byte('t')
        byte('Q') // BINPERSID
        int(0) // offset
        byte('('); shape.foreach(s => int(s)); byte('t')
        // contiguous row-major strides
        val strides = shape.scanRight(1)((s, acc) => s * acc).tail
        byte('('); strides.foreach(s => int(s)); byte('t')
        byte(0x89) // requires_grad = False
        global("collections", "OrderedDict"); byte(')'); byte('R') // backward hooks
        byte('t')
        byte('R')
      case Module(fqcn, attrs) =>
        val dot = fqcn.lastIndexOf('.')
        global(fqcn.substring(0, dot), fqcn.substring(dot + 1))
        byte(')'); byte(0x81) // NEWOBJ, no args
        byte('}') // state dict
        byte('(')
        attrs.foreach { case (k, v) => str(k); emit(v) }
        byte('u') // SETITEMS
        byte('b') // BUILD
    }
    byte(0x80); byte(2) // PROTO 2
    emit(model)
    byte('.')

    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def entry(name: String, bytes: Array[Byte]): Unit = {
      zip.putNextEntry(new ZipEntry(s"$root/$name")); zip.write(bytes); zip.closeEntry()
    }
    entry("data.pkl", pkl.toByteArray)
    entry("byteorder", "little".getBytes("UTF-8"))
    entry("version", "6\n".getBytes("UTF-8"))
    for ((key, data) <- storages.result()) {
      val bb = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(bb.putFloat)
      entry(s"data/$key", bb.array())
    }
    for ((path, text) <- code) entry(path, text.getBytes("UTF-8"))
    zip.close()
    bos.toByteArray
  }

  def writeTemp(prefix: String, root: String, model: Module,
      code: Map[String, String]): String = {
    val tmp = java.nio.file.Files.createTempFile(prefix, ".spt")
    java.nio.file.Files.write(tmp, write(root, model, code))
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  // frequently-used torch.nn fq class names
  val LinearCls = "__torch__.torch.nn.modules.linear.Linear"
  val SigmoidCls = "__torch__.torch.nn.modules.activation.Sigmoid"
  val TanhCls = "__torch__.torch.nn.modules.activation.Tanh"
  val GeluCls = "__torch__.torch.nn.modules.activation.GELU"
  val SoftmaxCls = "__torch__.torch.nn.modules.activation.Softmax"
  val LogSoftmaxCls = "__torch__.torch.nn.modules.activation.LogSoftmax"
  val ReluCls = "__torch__.torch.nn.modules.activation.ReLU"
  val SequentialCls = "__torch__.torch.nn.modules.container.Sequential"

  def linear(weight: Array[Float], out: Int, in: Int, bias: Array[Float]): Module =
    Module(LinearCls, Seq(
      "weight" -> Tensor(Seq(out, in), weight),
      "bias" -> Tensor(Seq(out), bias),
      "training" -> B(false)))

  val Conv1dCls = "__torch__.torch.nn.modules.conv.Conv1d"
  val ConstantPad1dCls = "__torch__.torch.nn.modules.padding.ConstantPad1d"

  /** nn.ConstantPad1d((l, r), value). */
  def constantPad1d(l: Int, r: Int, value: Double = 0.0): Module =
    Module(ConstantPad1dCls, Seq(
      "padding" -> Tup(Seq(I(l), I(r))),
      "value" -> F(value),
      "training" -> B(false)))
  val MaxPool1dCls = "__torch__.torch.nn.modules.pooling.MaxPool1d"
  val AdaptiveMaxPool1dCls = "__torch__.torch.nn.modules.pooling.AdaptiveMaxPool1d"
  val EmbeddingCls = "__torch__.torch.nn.modules.sparse.Embedding"

  val GruCls = "__torch__.torch.nn.modules.rnn.GRU"
  val LstmCls = "__torch__.torch.nn.modules.rnn.LSTM"

  /** nn.GRU / nn.LSTM (batch_first) with the attr set a real
   * torch.jit.save emits: packed gate weights `weight_ih_l0
   * (gates·H, in)` / `weight_hh_l0 (gates·H, H)` + biases, gate order
   * r,z,n (GRU) / i,f,g,o (LSTM); `reverseLayers` adds the
   * `_reverse`-suffixed per-layer weights of a bidirectional module
   * (layer 0 wIh is (gates·H, in), deeper layers (gates·H, 2H)). */
  def rnn(cls: String, wIh: Array[Float], wHh: Array[Float],
      bIh: Array[Float], bHh: Array[Float], input: Int, hidden: Int,
      numLayers: Int = 1, batchFirst: Boolean = true,
      extraLayers: Seq[(Array[Float], Array[Float], Array[Float], Array[Float])] =
        Nil,
      reverseLayers: Seq[(Array[Float], Array[Float], Array[Float], Array[Float])] =
        Nil): Module = {
    val gates = if (cls == LstmCls) 4 else 3
    val bidi = reverseLayers.nonEmpty
    val stackIn = if (bidi) 2 * hidden else hidden
    val stacked = extraLayers.zipWithIndex.flatMap {
      case ((wi, wh, bi, bh), k) => Seq(
        s"weight_ih_l${k + 1}" -> Tensor(Seq(gates * hidden, stackIn), wi),
        s"weight_hh_l${k + 1}" -> Tensor(Seq(gates * hidden, hidden), wh),
        s"bias_ih_l${k + 1}" -> Tensor(Seq(gates * hidden), bi),
        s"bias_hh_l${k + 1}" -> Tensor(Seq(gates * hidden), bh))
    }
    val reversed = reverseLayers.zipWithIndex.flatMap {
      case ((wi, wh, bi, bh), k) => Seq(
        s"weight_ih_l${k}_reverse" ->
          Tensor(Seq(gates * hidden, if (k == 0) input else stackIn), wi),
        s"weight_hh_l${k}_reverse" -> Tensor(Seq(gates * hidden, hidden), wh),
        s"bias_ih_l${k}_reverse" -> Tensor(Seq(gates * hidden), bi),
        s"bias_hh_l${k}_reverse" -> Tensor(Seq(gates * hidden), bh))
    }
    Module(cls, Seq(
      "mode" -> Str(if (cls == LstmCls) "LSTM" else "GRU"),
      "input_size" -> I(input), "hidden_size" -> I(hidden),
      "num_layers" -> I(numLayers), "bias" -> B(true),
      "batch_first" -> B(batchFirst), "dropout" -> F(0.0),
      "bidirectional" -> B(bidi), "proj_size" -> I(0),
      "weight_ih_l0" -> Tensor(Seq(gates * hidden, input), wIh),
      "weight_hh_l0" -> Tensor(Seq(gates * hidden, hidden), wHh),
      "bias_ih_l0" -> Tensor(Seq(gates * hidden), bIh),
      "bias_hh_l0" -> Tensor(Seq(gates * hidden), bHh)) ++ stacked ++ reversed ++ Seq(
      "training" -> B(false)))
  }

  val MhaCls = "__torch__.torch.nn.modules.activation.MultiheadAttention"
  val OutProjCls = "__torch__.torch.nn.modules.linear.NonDynamicallyQuantizableLinear"

  /** nn.MultiheadAttention (batch_first, packed in_proj) with the attr
   * set a real torch.jit.save emits — out_proj serializes as the
   * NonDynamicallyQuantizableLinear subclass. */
  def mha(inProjW: Array[Float], inProjB: Array[Float],
      outW: Array[Float], outB: Array[Float], embed: Int, heads: Int): Module =
    Module(MhaCls, Seq(
      "training" -> B(false),
      "embed_dim" -> I(embed), "num_heads" -> I(heads),
      "dropout" -> F(0.0), "batch_first" -> B(true),
      "_qkv_same_embed_dim" -> B(true),
      "in_proj_weight" -> Tensor(Seq(3 * embed, embed), inProjW),
      "in_proj_bias" -> Tensor(Seq(3 * embed), inProjB),
      "bias_k" -> NoneV, "bias_v" -> NoneV,
      "add_zero_attn" -> B(false),
      "out_proj" -> Module(OutProjCls, Seq(
        "weight" -> Tensor(Seq(embed, embed), outW),
        "bias" -> Tensor(Seq(embed), outB),
        "training" -> B(false)))))

  /** nn.MultiheadAttention built with explicit kdim/vdim: torch stores
   * `_qkv_same_embed_dim=False` and three separate projection weights
   * (q_proj_weight/k_proj_weight/v_proj_weight) instead of the packed
   * in_proj_weight; in_proj_bias stays packed. `kdim`/`vdim` default
   * to embed (the self-attention case). */
  def mhaSeparate(qW: Array[Float], kW: Array[Float], vW: Array[Float],
      inProjB: Array[Float], outW: Array[Float], outB: Array[Float],
      embed: Int, heads: Int, kdim: Int = -1, vdim: Int = -1): Module = {
    val kd = if (kdim < 0) embed else kdim
    val vd = if (vdim < 0) embed else vdim
    Module(MhaCls, Seq(
      "training" -> B(false),
      "embed_dim" -> I(embed), "num_heads" -> I(heads),
      "kdim" -> I(kd), "vdim" -> I(vd),
      "dropout" -> F(0.0), "batch_first" -> B(true),
      "_qkv_same_embed_dim" -> B(false),
      "q_proj_weight" -> Tensor(Seq(embed, embed), qW),
      "k_proj_weight" -> Tensor(Seq(embed, kd), kW),
      "v_proj_weight" -> Tensor(Seq(embed, vd), vW),
      "in_proj_weight" -> NoneV,
      "in_proj_bias" -> Tensor(Seq(3 * embed), inProjB),
      "bias_k" -> NoneV, "bias_v" -> NoneV,
      "add_zero_attn" -> B(false),
      "out_proj" -> Module(OutProjCls, Seq(
        "weight" -> Tensor(Seq(embed, embed), outW),
        "bias" -> Tensor(Seq(embed), outB),
        "training" -> B(false)))))
  }

  val Conv2dCls = "__torch__.torch.nn.modules.conv.Conv2d"
  val AdaptiveMaxPool2dCls = "__torch__.torch.nn.modules.pooling.AdaptiveMaxPool2d"

  /** nn.Conv2d with the 2-tuple hyper-params a real torch.jit.save
   * emits. `paddingStr` (e.g. "same") overrides numeric padding with
   * the string form torch stores for `padding='same'`. */
  def conv2d(weight: Array[Float], outCh: Int, inCh: Int, kh: Int, kw: Int,
      bias: Array[Float], stride: Int = 1, padding: Int = 0,
      groups: Int = 1, dilation: Int = 1, paddingStr: String = null): Module =
    Module(Conv2dCls, Seq(
      "weight" -> Tensor(Seq(outCh, inCh / groups, kh, kw), weight),
      "bias" -> Tensor(Seq(outCh), bias),
      "stride" -> Tup(Seq(I(stride), I(stride))),
      "padding" -> (if (paddingStr != null) Str(paddingStr)
                    else Tup(Seq(I(padding), I(padding)))),
      "dilation" -> Tup(Seq(I(dilation), I(dilation))),
      "groups" -> I(groups),
      "in_channels" -> I(inCh),
      "out_channels" -> I(outCh),
      "kernel_size" -> Tup(Seq(I(kh), I(kw))),
      "padding_mode" -> Str("zeros"),
      "training" -> B(false)))

  /** nn.Conv1d with the full attr set a real torch.jit.save emits
   * (hyper-params as 1-tuples). `paddingStr` (e.g. "same"/"valid")
   * overrides the numeric padding with the string form torch stores
   * for `padding='same'`. */
  def conv1d(weight: Array[Float], outCh: Int, inCh: Int, k: Int,
      bias: Array[Float], stride: Int = 1, padding: Int = 0,
      groups: Int = 1, dilation: Int = 1, paddingStr: String = null): Module =
    Module(Conv1dCls, Seq(
      "weight" -> Tensor(Seq(outCh, inCh / groups, k), weight),
      "bias" -> Tensor(Seq(outCh), bias),
      "stride" -> Tup(Seq(I(stride))),
      "padding" -> (if (paddingStr != null) Str(paddingStr)
                    else Tup(Seq(I(padding)))),
      "dilation" -> Tup(Seq(I(dilation))),
      "groups" -> I(groups),
      "in_channels" -> I(inCh),
      "out_channels" -> I(outCh),
      "kernel_size" -> Tup(Seq(I(k))),
      "padding_mode" -> Str("zeros"),
      "training" -> B(false)))
}
