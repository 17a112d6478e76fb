package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q123/q124's numerical-safety contract on real fixture data: the
  * engine's f32-rounded recurrent forward must agree with an independent
  * all-f64 recompute on EVERY document's argmax, and the f64 runner-up
  * gap must clear the drift bound by orders of magnitude (the engine's
  * only roundings are the RNN output and the fc GEMM, ~1e-6 absolute on
  * a logit, plus cross-libm exp/tanh ulps through <= 12 recurrence
  * steps; a 1e-3 gap floor is >100x that). */
class TorchRnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def toks(dir: String, vocab: Int, maxLen: Int): Array[(Long, Array[Int])] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
          1, maxLen).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toInt).toArray)

  private def check(name: String, m: TorchScriptModel,
      recur: (Array[Int], EmbeddingSeqOp, RnnOp) => Array[Double]): Unit = {
    val e = m.seqHead.get
    val op = m.ops.collectFirst { case r: RnnOp => r }.get
    val fc = m.ops.collectFirst { case l: LinearLayer => l }.get
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
    assert(rows.length > 0)
    val engine = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val docs = toks(dir, e.vocab, 12)
    assert(docs.length == engine.size)
    var minGap = Double.MaxValue
    for ((docId, ids) <- docs) {
      val h = recur(ids, e, op)
      assert(h.length == fc.inDim)
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + h.indices.map(j => h(j) * fc.weight(o * fc.inDim + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"$name doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"$name argmax gap floor violated: $minGap")
  }

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))

  test("sf0.001 GRU: engine argmax == f64 recompute on every doc; gap floor holds") {
    check("q123_torch_gru", graft.SparkEntry.gruModel, (ids, e, op) => {
      val H = op.hidden
      val h = new Array[Double](H)
      for (t <- ids) {
        val x = Array.tabulate(e.embDim)(j => e.weight(t * e.embDim + j).toDouble)
        def ih(g: Int, o: Int) = op.bIh(g * H + o) +
          (0 until op.inDim).map(j => op.wIh((g * H + o) * op.inDim + j).toDouble * x(j)).sum
        def hh(g: Int, o: Int) = op.bHh(g * H + o) +
          (0 until H).map(j => op.wHh((g * H + o) * H + j).toDouble * h(j)).sum
        val hNew = Array.tabulate(H) { o =>
          val r = sigmoid(ih(0, o) + hh(0, o))
          val z = sigmoid(ih(1, o) + hh(1, o))
          val n = math.tanh(ih(2, o) + r * hh(2, o))
          (1.0 - z) * n + z * h(o)
        }
        System.arraycopy(hNew, 0, h, 0, H)
      }
      h
    })
  }

  test("sf0.001 LSTM: engine argmax == f64 recompute on every doc; gap floor holds") {
    check("q124_torch_lstm", graft.SparkEntry.lstmModel, (ids, e, op) => {
      val H = op.hidden
      val h = new Array[Double](H)
      val c = new Array[Double](H)
      for (t <- ids) {
        val x = Array.tabulate(e.embDim)(j => e.weight(t * e.embDim + j).toDouble)
        def gate(g: Int, o: Int) = op.bIh(g * H + o) + op.bHh(g * H + o) +
          (0 until op.inDim).map(j => op.wIh((g * H + o) * op.inDim + j).toDouble * x(j)).sum +
          (0 until H).map(j => op.wHh((g * H + o) * H + j).toDouble * h(j)).sum
        val cNew = new Array[Double](H)
        val hNew = new Array[Double](H)
        for (o <- 0 until H) {
          val i = sigmoid(gate(0, o))
          val f = sigmoid(gate(1, o))
          val g = math.tanh(gate(2, o))
          val og = sigmoid(gate(3, o))
          cNew(o) = f * c(o) + i * g
          hNew(o) = og * math.tanh(cNew(o))
        }
        System.arraycopy(cNew, 0, c, 0, H)
        System.arraycopy(hNew, 0, h, 0, H)
      }
      h
    })
  }

  /** Forward + reverse f64 GRU scans -> the BiRNN cat read-out; shared
    * by the q143 check and the bias-tuning harness. */
  private[torch] def biGruHidden(ids: Array[Int], e: EmbeddingSeqOp,
      op: RnnOp): Array[Double] = {
    val H = op.hidden
    def scan(order: Seq[Int], wIh: Array[Float], wHh: Array[Float],
        bIh: Array[Float], bHh: Array[Float]): Array[Double] = {
      val h = new Array[Double](H)
      for (t <- order) {
        val x = Array.tabulate(e.embDim)(j => e.weight(t * e.embDim + j).toDouble)
        def ih(g: Int, o: Int) = bIh(g * H + o) +
          (0 until op.inDim).map(j => wIh((g * H + o) * op.inDim + j).toDouble * x(j)).sum
        def hh(g: Int, o: Int) = bHh(g * H + o) +
          (0 until H).map(j => wHh((g * H + o) * H + j).toDouble * h(j)).sum
        val hNew = Array.tabulate(H) { o =>
          val r = sigmoid(ih(0, o) + hh(0, o))
          val z = sigmoid(ih(1, o) + hh(1, o))
          val n = math.tanh(ih(2, o) + r * hh(2, o))
          (1.0 - z) * n + z * h(o)
        }
        System.arraycopy(hNew, 0, h, 0, H)
      }
      h
    }
    val rv = op.rev.head
    scan(ids.toIndexedSeq, op.wIh, op.wHh, op.bIh, op.bHh) ++
      scan(ids.reverse.toIndexedSeq, rv.wIh, rv.wHh, rv.bIh, rv.bHh)
  }

  /** f64 GRU scan collecting the hidden AFTER each position, averaged —
    * the out.mean(1) read-out; shared with the bias-tuning harness. */
  private[torch] def meanGruHidden(ids: Array[Int], e: EmbeddingSeqOp,
      op: RnnOp): Array[Double] = {
    val H = op.hidden
    val h = new Array[Double](H)
    val acc = new Array[Double](H)
    for (t <- ids) {
      val x = Array.tabulate(e.embDim)(j => e.weight(t * e.embDim + j).toDouble)
      def ih(g: Int, o: Int) = op.bIh(g * H + o) +
        (0 until op.inDim).map(j => op.wIh((g * H + o) * op.inDim + j).toDouble * x(j)).sum
      def hh(g: Int, o: Int) = op.bHh(g * H + o) +
        (0 until H).map(j => op.wHh((g * H + o) * H + j).toDouble * h(j)).sum
      val hNew = Array.tabulate(H) { o =>
        val r = sigmoid(ih(0, o) + hh(0, o))
        val z = sigmoid(ih(1, o) + hh(1, o))
        val n = math.tanh(ih(2, o) + r * hh(2, o))
        (1.0 - z) * n + z * h(o)
      }
      System.arraycopy(hNew, 0, h, 0, H)
      for (o <- 0 until H) acc(o) += hNew(o)
    }
    acc.map(_ / ids.length)
  }

  test("sf0.001 mean-pooled GRU: engine argmax == f64 recompute; gap floor holds") {
    check("q144_torch_gru_meanpool", graft.SparkEntry.meanGruModel, (ids, e, op) =>
      meanGruHidden(ids, e, op))
  }

  test("sf0.001 BiGRU: engine argmax == f64 fwd+rev recompute; gap floor holds") {
    check("q143_torch_bigru", graft.SparkEntry.biGruModel, (ids, e, op) =>
      biGruHidden(ids, e, op))
  }

  /** BiLSTM sibling of [[biGruHidden]]: per-direction cell state. */
  private[torch] def biLstmHidden(ids: Array[Int], e: EmbeddingSeqOp,
      op: RnnOp): Array[Double] = {
    val H = op.hidden
    def scan(order: Seq[Int], wIh: Array[Float], wHh: Array[Float],
        bIh: Array[Float], bHh: Array[Float]): Array[Double] = {
      val h = new Array[Double](H)
      val c = new Array[Double](H)
      for (t <- order) {
        val x = Array.tabulate(e.embDim)(j => e.weight(t * e.embDim + j).toDouble)
        def gate(g: Int, o: Int) = bIh(g * H + o) + bHh(g * H + o) +
          (0 until op.inDim).map(j => wIh((g * H + o) * op.inDim + j).toDouble * x(j)).sum +
          (0 until H).map(j => wHh((g * H + o) * H + j).toDouble * h(j)).sum
        val cNew = new Array[Double](H)
        val hNew = new Array[Double](H)
        for (o <- 0 until H) {
          val i = sigmoid(gate(0, o))
          val f = sigmoid(gate(1, o))
          val g = math.tanh(gate(2, o))
          val og = sigmoid(gate(3, o))
          cNew(o) = f * c(o) + i * g
          hNew(o) = og * math.tanh(cNew(o))
        }
        System.arraycopy(cNew, 0, c, 0, H)
        System.arraycopy(hNew, 0, h, 0, H)
      }
      h
    }
    val rv = op.rev.head
    scan(ids.toIndexedSeq, op.wIh, op.wHh, op.bIh, op.bHh) ++
      scan(ids.reverse.toIndexedSeq, rv.wIh, rv.wHh, rv.bIh, rv.bHh)
  }

  test("sf0.001 BiLSTM: engine argmax == f64 fwd+rev recompute; gap floor holds") {
    check("q149_torch_bilstm", graft.SparkEntry.biLstmModel, (ids, e, op) =>
      biLstmHidden(ids, e, op))
  }

  test("sf0.001 stacked GRU: engine argmax == f64 2-layer recompute; gap floor holds") {
    check("q142_torch_stacked_gru", graft.SparkEntry.stackedGruModel, (ids, e, op) => {
      val H = op.hidden
      val l2 = op.stack.head
      val h1 = new Array[Double](H)
      val h2 = new Array[Double](H)
      def gruStep(x: Array[Double], h: Array[Double], wIh: Array[Float],
          wHh: Array[Float], bIh: Array[Float], bHh: Array[Float],
          inDim: Int): Array[Double] = {
        def ih(g: Int, o: Int) = bIh(g * H + o) +
          (0 until inDim).map(j => wIh((g * H + o) * inDim + j).toDouble * x(j)).sum
        def hh(g: Int, o: Int) = bHh(g * H + o) +
          (0 until H).map(j => wHh((g * H + o) * H + j).toDouble * h(j)).sum
        Array.tabulate(H) { o =>
          val r = sigmoid(ih(0, o) + hh(0, o))
          val z = sigmoid(ih(1, o) + hh(1, o))
          val n = math.tanh(ih(2, o) + r * hh(2, o))
          (1.0 - z) * n + z * h(o)
        }
      }
      for (t <- ids) {
        val x = Array.tabulate(e.embDim)(j => e.weight(t * e.embDim + j).toDouble)
        // layer 2 reads layer 1's NEW hidden at the SAME position
        val n1 = gruStep(x, h1, op.wIh, op.wHh, op.bIh, op.bHh, op.inDim)
        val n2 = gruStep(n1, h2, l2.wIh, l2.wHh, l2.bIh, l2.bHh, H)
        System.arraycopy(n1, 0, h1, 0, H)
        System.arraycopy(n2, 0, h2, 0, H)
      }
      h2 // the classifier reads h_n[-1]: the TOP layer
    })
  }
}
