package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q122's numerical-safety contract on real fixture data: the engine's
  * f32-rounded attention forward must agree with an independent all-f64
  * recompute on EVERY document's argmax, and the f64 runner-up gap must
  * clear the drift bound by orders of magnitude (the engine's only
  * roundings are the attention output and the fc GEMM, ~1e-6 absolute
  * on a logit; a 1e-3 gap floor is >100x that). */
class TorchAttentionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sf0.001: engine argmax == f64 recompute on every doc; gap floor holds") {
    val m = graft.SparkEntry.attnModel
    val e = m.seqHead.get
    val at = m.ops.collectFirst { case a: SelfAttentionOp => a }.get
    val fc = m.ops.collectFirst { case l: LinearLayer => l }.get
    val d = at.dim

    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q122_torch_attention")(spark, dir).collect()
    assert(rows.length > 0)
    val engine = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap

    // identical tokenization, collected for the in-test f64 recompute
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % e.vocab),
          1, 16).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toInt).toArray)
    assert(toks.length == engine.size)

    var minGap = Double.MaxValue
    for ((docId, ids) <- toks) {
      val L = ids.length
      val x = Array.tabulate(L, at.inDim)((p, j) => e.weight(ids(p) * e.embDim + j).toDouble)
      def proj(w: Array[Float], b: Array[Float]): Array[Array[Double]] =
        Array.tabulate(L, d)((p, o) =>
          b(o) + (0 until at.inDim).map(j => x(p)(j) * w(o * at.inDim + j)).sum)
      val (qm, km, vm) = (proj(at.wq, at.bq), proj(at.wk, at.bk), proj(at.wv, at.bv))
      val pooled = new Array[Double](d)
      for (a <- 0 until L) {
        val sc = Array.tabulate(L)(b0 =>
          (0 until d).map(j => qm(a)(j) * km(b0)(j)).sum * at.scale)
        val mx = sc.max
        val es = sc.map(s0 => math.exp(s0 - mx))
        val z = es.sum
        for (j <- 0 until d)
          pooled(j) += (0 until L).map(b0 => es(b0) * vm(b0)(j)).sum / z / L
      }
      val logits = Array.tabulate(fc.outDim)(o =>
        fc.bias(o) + (0 until d).map(j => pooled(j) * fc.weight(o * d + j)).sum)
      val cls = logits.indexOf(logits.max)
      assert(engine(docId) == cls, s"doc $docId: engine ${engine(docId)} vs f64 $cls")
      val sorted = logits.sorted
      minGap = math.min(minGap, sorted(fc.outDim - 1) - sorted(fc.outDim - 2))
    }
    assert(minGap > 1e-3, s"argmax gap floor violated: $minGap")
  }
}
