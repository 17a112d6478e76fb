package graft.torch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipInputStream
import scala.collection.mutable

import Pickle._

/** One dense layer: `y = x · Wᵀ + b`, weight row-major `(outDim, inDim)`. */
final case class LinearLayer(weight: Array[Float], bias: Array[Float], outDim: Int, inDim: Int)
    extends Serializable

/**
 * A TorchScript MLP loaded from a `torch.jit.save` archive, executed on
 * the JVM with a plain float GEMM (no libtorch).
 *
 * Scope: `nn.Linear` + `nn.ReLU` sequential models — exactly the op set
 * the reference model uses (reference model/iris.spt:
 * `code/__torch__.py` shows Linear(4,128) → ReLU → Linear(128,64) →
 * ReLU → Linear(64,3)); anything else fails loudly at load time, in the
 * same spirit as the reference's narrow type dispatch
 * (reference src/udf.rs:59-64).
 *
 * Layers apply in the order the submodules appear in `data.pkl`'s module
 * state dict (= registration order = forward order for these sequential
 * classifiers), with ReLU between consecutive Linears and a linear last
 * layer (logits out).
 */
final class TorchScriptModel(val layers: IndexedSeq[LinearLayer]) extends Serializable {
  require(layers.nonEmpty, "model has no linear layers")
  val inDim: Int = layers.head.inDim
  val outDim: Int = layers.last.outDim

  /** Single-row forward. */
  def forward(x: Array[Float]): Array[Float] = forwardBatch(x, 1)

  /**
   * Batched forward: `x` is `n × inDim` row-major; returns `n × outDim`
   * row-major — mirrors the reference's batch GEMM shape
   * (reference src/udf.rs:211-213, 277).
   */
  def forwardBatch(x: Array[Float], n: Int): Array[Float] = {
    require(x.length == n * inDim, s"expected $n x $inDim = ${n * inDim} values, got ${x.length}")
    var cur = x
    var curDim = inDim
    var li = 0
    while (li < layers.length) {
      val l = layers(li)
      require(curDim == l.inDim, s"layer $li expects ${l.inDim} features, got $curDim")
      val out = new Array[Float](n * l.outDim)
      val w = l.weight
      val b = l.bias
      val lastLayer = li == layers.length - 1
      var i = 0
      while (i < n) {
        val xOff = i * curDim
        val oOff = i * l.outDim
        var o = 0
        while (o < l.outDim) {
          val wOff = o * curDim
          var acc = b(o)
          var k = 0
          while (k < curDim) { acc += cur(xOff + k) * w(wOff + k); k += 1 }
          // fused ReLU between layers (logits pass through on the last)
          out(oOff + o) = if (!lastLayer && acc < 0f) 0f else acc
          o += 1
        }
        i += 1
      }
      cur = out
      curDim = l.outDim
      li += 1
    }
    cur
  }
}

object TorchScriptModel {

  /** Load from a URL/path. `file:` and bare paths read locally; any other
   * scheme (hdfs:, s3a:, ...) goes through Hadoop FileSystem, mirroring
   * the reference's object_store-based fetch (reference src/lib.rs:64-77). */
  def load(url: String): TorchScriptModel = fromBytes(readAllBytes(url))

  def readAllBytes(url: String): Array[Byte] = {
    val uri = new java.net.URI(url)
    uri.getScheme match {
      case null | "file" =>
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          if (uri.getScheme == null) url else uri.getPath))
      case _ =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val p = new org.apache.hadoop.fs.Path(url)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try {
          val out = new ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        } finally in.close()
    }
  }

  def fromBytes(bytes: Array[Byte]): TorchScriptModel = {
    val entries = readZip(bytes)
    // Archive layout: <root>/data.pkl + <root>/data/<key> (reference
    // model/iris.spt has root "iris_default_scripted").
    val pklName = entries.keys.find(_.endsWith("/data.pkl"))
      .orElse(entries.keys.find(_ == "data.pkl"))
      .getOrElse(sys.error("not a TorchScript archive: no data.pkl"))
    val root = pklName.stripSuffix("data.pkl")
    entries.get(root + "byteorder").foreach { b =>
      val bo = new String(b, "UTF-8").trim
      require(bo == "little", s"unsupported byteorder: $bo")
    }
    val tree = Pickle.load(entries(pklName))

    val layers = IndexedSeq.newBuilder[LinearLayer]
    def classify(cls: PGlobal): String = {
      val n = cls.name
      if (n == "Linear" || cls.module.contains("modules.linear")) "linear"
      else if (n == "ReLU" || cls.module.contains("modules.activation")) "relu"
      else if (cls.module.startsWith("__torch__") && !cls.module.contains("torch.nn")) "module"
      else sys.error(s"unsupported TorchScript op: ${cls.module}.${cls.name} " +
        "(this loader supports sequential Linear/ReLU models only)")
    }
    def tensorOf(state: PDict, key: String): PTensor =
      state.items.get(PStr(key)) match {
        case Some(t: PTensor) => t
        case other => sys.error(s"linear module missing tensor '$key' (got $other)")
      }
    def walk(obj: PObj): Unit = classify(obj.cls) match {
      case "linear" =>
        val st = obj.state.asInstanceOf[PDict]
        val w = tensorOf(st, "weight")
        val b = tensorOf(st, "bias")
        require(w.shape.length == 2, s"linear weight must be 2-D, got ${w.shape}")
        require(b.shape.length == 1 && b.shape(0) == w.shape(0),
          s"bias shape ${b.shape} incompatible with weight ${w.shape}")
        layers += LinearLayer(
          materializeF32(w, entries, root), materializeF32(b, entries, root),
          outDim = w.shape(0), inDim = w.shape(1))
      case "relu" => // non-parametric; position implied by layer order
      case "module" =>
        obj.state match {
          case d: PDict =>
            d.items.valuesIterator.foreach {
              case sub: PObj => walk(sub)
              case _ => // training flag, hook slots, ...
            }
          case other => sys.error(s"module ${obj.cls.name} has non-dict state: $other")
        }
    }
    tree match {
      case o: PObj => walk(o)
      case other => sys.error(s"data.pkl root is not a module object: $other")
    }
    new TorchScriptModel(layers.result())
  }

  /** Gather a tensor's values into a row-major Array[Float], honoring
   * offset/strides (torch saves contiguous tensors; we support general
   * strides anyway). */
  private def materializeF32(
      t: PTensor, entries: Map[String, Array[Byte]], root: String): Array[Float] = {
    val raw = entries.getOrElse(root + "data/" + t.storageKey,
      sys.error(s"storage data/${t.storageKey} missing from archive"))
    val elemSize = t.storageCls match {
      case "FloatStorage" => 4
      case "DoubleStorage" => 8
      case "HalfStorage" => 2
      case other => sys.error(s"unsupported storage type: $other")
    }
    val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    def read(idx: Long): Float = t.storageCls match {
      case "FloatStorage" => buf.getFloat((idx * elemSize).toInt)
      case "DoubleStorage" => buf.getDouble((idx * elemSize).toInt).toFloat
      case "HalfStorage" => halfToFloat(buf.getShort((idx * elemSize).toInt))
    }
    val numel = t.shape.product
    val out = new Array[Float](numel)
    val rank = t.shape.length
    val idx = new Array[Int](rank)
    var i = 0
    while (i < numel) {
      var off = t.offset
      var d = 0
      while (d < rank) { off += idx(d).toLong * t.stride(d); d += 1 }
      out(i) = read(off)
      // odometer increment (row-major)
      var d2 = rank - 1
      var carry = true
      while (carry && d2 >= 0) {
        idx(d2) += 1
        if (idx(d2) == t.shape(d2)) { idx(d2) = 0; d2 -= 1 } else carry = false
      }
      i += 1
    }
    out
  }

  private def halfToFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    val f =
      if (exp == 0) { // zero / subnormal: value = mant * 2^-24
        val v = mant * (1.0f / (1 << 24))
        if (sign != 0) -v else v
      } else if (exp == 0x1f) {
        if (mant == 0) { if (sign != 0) Float.NegativeInfinity else Float.PositiveInfinity }
        else Float.NaN
      } else java.lang.Float.intBitsToFloat(sign | ((exp + 112) << 23) | (mant << 13))
    f
  }

  /** torch.jit.save emits STORED entries with EXT descriptors, which
   * ZipInputStream rejects — go through ZipFile (central directory). */
  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val tmp = java.nio.file.Files.createTempFile("graft-torchscript", ".zip")
    try {
      java.nio.file.Files.write(tmp, bytes)
      val zf = new java.util.zip.ZipFile(tmp.toFile)
      try {
        val out = mutable.Map.empty[String, Array[Byte]]
        val en = zf.entries()
        while (en.hasMoreElements) {
          val e = en.nextElement()
          if (!e.isDirectory) {
            val in = zf.getInputStream(e)
            val bos = new ByteArrayOutputStream()
            val buf = new Array[Byte](1 << 16)
            var n = in.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
            in.close()
            out(e.getName) = bos.toByteArray
          }
        }
        out.toMap
      } finally zf.close()
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
