package graft.torch

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/**
 * Minimal pickle (protocol 2/3/4 subset) virtual machine — just enough to
 * decode the `data.pkl` that `torch.jit.save` emits for a TorchScript
 * archive (see reference /root/reference/model/iris.spt: protocol-2
 * stream using PROTO, GLOBAL, BINPUT/BINGET, NEWOBJ, BUILD, REDUCE,
 * BINPERSID, MARK/TUPLE/SETITEMS and small-int/unicode pushes).
 *
 * This is NOT a general unpickler: it builds an inert object tree
 * ([[PVal]]) and never executes arbitrary constructors. The only
 * "callables" it interprets are `torch._utils._rebuild_tensor_v2`
 * (→ [[PTensor]]) and `collections.OrderedDict` (→ empty dict); anything
 * else REDUCEd is kept symbolically and fails loudly only if the model
 * extractor needs to look inside it.
 */
object Pickle {

  sealed trait PVal
  case object PNone extends PVal
  final case class PBool(b: Boolean) extends PVal
  final case class PInt(n: Long) extends PVal
  final case class PFloat(d: Double) extends PVal
  final case class PStr(s: String) extends PVal
  final case class PBytes(b: Array[Byte]) extends PVal
  final case class PTuple(items: Vector[PVal]) extends PVal
  final case class PList(items: mutable.ArrayBuffer[PVal]) extends PVal
  final case class PDict(items: mutable.LinkedHashMap[PVal, PVal]) extends PVal
  final case class PGlobal(module: String, name: String) extends PVal
  /** NEWOBJ instance; `state` is attached by BUILD. */
  final case class PObj(cls: PGlobal, args: PVal, var state: PVal) extends PVal
  /** Persistent id (BINPERSID) — torch uses ("storage", <StorageCls>, key, device, numel). */
  final case class PPersId(pid: PVal) extends PVal
  /** Unresolved REDUCE result kept symbolically. */
  final case class PReduced(callable: PVal, args: PVal) extends PVal

  /** A torch tensor reference decoded from `_rebuild_tensor_v2`.
   * Storage is resolved later against the zip's `data/<key>` entries. */
  final case class PTensor(
      storageCls: String, // e.g. "FloatStorage"
      storageKey: String, // e.g. "0"
      numel: Long,
      offset: Long,
      shape: Vector[Int],
      stride: Vector[Int]) extends PVal

  private final case class Mark() extends PVal

  def load(bytes: Array[Byte]): PVal = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[PVal]
    val memo = mutable.LongMap.empty[PVal]

    def push(v: PVal): Unit = stack += v
    def pop(): PVal = { val v = stack.last; stack.dropRightInPlace(1); v }
    def popToMark(): Vector[PVal] = {
      val idx = stack.lastIndexWhere(_.isInstanceOf[Mark])
      require(idx >= 0, "pickle: no MARK on stack")
      val items = stack.slice(idx + 1, stack.length).toVector
      stack.dropRightInPlace(stack.length - idx)
      items
    }
    def readLine(): String = {
      val sb = new StringBuilder
      var c = buf.get()
      while (c != '\n') { sb.append(c.toChar); c = buf.get() }
      sb.toString
    }
    def readBytes(n: Int): Array[Byte] = { val a = new Array[Byte](n); buf.get(a); a }
    def utf8(n: Int): String = new String(readBytes(n), "UTF-8")

    def reduce(callable: PVal, args: PVal): PVal = (callable, args) match {
      case (PGlobal("torch._utils", "_rebuild_tensor_v2"),
            PTuple(Vector(PPersId(PTuple(Vector(PStr("storage"), PGlobal(_, storageCls), PStr(key), _, PInt(numel)))),
                          PInt(off), PTuple(shape), PTuple(stride), _, _*))) =>
        PTensor(storageCls, key, numel, off,
          shape.map { case PInt(n) => n.toInt; case v => sys.error(s"pickle: bad shape elem $v") },
          stride.map { case PInt(n) => n.toInt; case v => sys.error(s"pickle: bad stride elem $v") })
      case (PGlobal("collections", "OrderedDict"), _) =>
        PDict(mutable.LinkedHashMap.empty)
      case _ => PReduced(callable, args)
    }

    var running = true
    while (running) {
      val op = buf.get() & 0xff
      op match {
        case 0x80 => buf.get() // PROTO
        case '.' => running = false // STOP
        case '(' => push(Mark()) // MARK
        case 'N' => push(PNone)
        case 0x88 => push(PBool(true)) // NEWTRUE
        case 0x89 => push(PBool(false)) // NEWFALSE
        case 'K' => push(PInt(buf.get() & 0xffL)) // BININT1
        case 'M' => push(PInt(buf.getShort() & 0xffffL)) // BININT2
        case 'J' => push(PInt(buf.getInt().toLong)) // BININT
        case 0x8a => // LONG1
          val n = buf.get() & 0xff
          val b = readBytes(n)
          var v = 0L
          var i = n - 1
          while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
          if (n > 0 && (b(n - 1) & 0x80) != 0) v -= (1L << (8 * n))
          push(PInt(v))
        case 'G' => // BINFLOAT (big-endian!)
          val old = buf.order(); buf.order(ByteOrder.BIG_ENDIAN)
          push(PFloat(buf.getDouble())); buf.order(old)
        case 'X' => push(PStr(utf8(buf.getInt()))) // BINUNICODE
        case 0x8c => push(PStr(utf8(buf.get() & 0xff))) // SHORT_BINUNICODE
        case 'C' => push(PBytes(readBytes(buf.get() & 0xff))) // SHORT_BINBYTES
        case 'B' => push(PBytes(readBytes(buf.getInt()))) // BINBYTES
        case 'c' => push(PGlobal(readLine(), readLine())) // GLOBAL
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val module = pop()
          (module, name) match {
            case (PStr(m), PStr(n)) => push(PGlobal(m, n))
            case other => sys.error(s"pickle: STACK_GLOBAL on $other")
          }
        case ')' => push(PTuple(Vector.empty)) // EMPTY_TUPLE
        case 't' => push(PTuple(popToMark())) // TUPLE
        case 0x85 => push(PTuple(Vector(pop()))) // TUPLE1
        case 0x86 => { val b = pop(); val a = pop(); push(PTuple(Vector(a, b))) } // TUPLE2
        case 0x87 => { val c = pop(); val b = pop(); val a = pop(); push(PTuple(Vector(a, b, c))) } // TUPLE3
        case ']' => push(PList(mutable.ArrayBuffer.empty)) // EMPTY_LIST
        case 'a' => { val v = pop(); stack.last.asInstanceOf[PList].items += v } // APPEND
        case 'e' => { val items = popToMark(); stack.last.asInstanceOf[PList].items ++= items } // APPENDS
        case '}' => push(PDict(mutable.LinkedHashMap.empty)) // EMPTY_DICT
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last.asInstanceOf[PDict].items(k) = v
        case 'u' => // SETITEMS
          val items = popToMark()
          val d = stack.last.asInstanceOf[PDict]
          items.grouped(2).foreach { case Vector(k, v) => d.items(k) = v }
        case 'q' => memo(buf.get() & 0xffL) = stack.last // BINPUT
        case 'r' => memo(buf.getInt() & 0xffffffffL) = stack.last // LONG_BINPUT
        case 0x94 => memo(memo.size.toLong) = stack.last // MEMOIZE
        case 'h' => push(memo(buf.get() & 0xffL)) // BINGET
        case 'j' => push(memo(buf.getInt() & 0xffffffffL)) // LONG_BINGET
        case 0x81 => { val args = pop(); val cls = pop(); push(PObj(cls.asInstanceOf[PGlobal], args, PNone)) } // NEWOBJ
        case 'R' => { val args = pop(); val callable = pop(); push(reduce(callable, args)) } // REDUCE
        case 'b' => // BUILD
          val state = pop()
          stack.last match {
            case o: PObj => o.state = state
            case other => sys.error(s"pickle: BUILD on $other")
          }
        case 'Q' => push(PPersId(pop())) // BINPERSID
        case '0' => pop() // POP
        case '2' => push(stack.last) // DUP
        case other => sys.error(f"pickle: unsupported opcode 0x$other%02x at ${buf.position() - 1}")
      }
    }
    require(stack.length == 1, s"pickle: ${stack.length} values left on stack")
    stack.head
  }
}
