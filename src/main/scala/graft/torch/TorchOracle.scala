package graft.torch

/**
 * Generates DuckDB SQL that evaluates a Linear/ReLU MLP's forward pass
 * as plain arithmetic (one CTE per layer, `GREATEST(0, …)` for ReLU,
 * first-max-wins CASE for argmax) — an EXACT, independently-executed
 * oracle for the torch inference queries: DuckDB re-computes the
 * network from the same weights in float64 and must land on the same
 * argmax. Safety: the iris model's smallest runner-up logit gap across
 * all 314 rows is 2.42 (measured), ~5 orders of magnitude above the
 * float32-vs-float64 drift, so the argmax is numerically pinned.
 *
 * The reference's only correctness artifact is the golden 15-row LIMIT
 * query (reference src/lib.rs:172-192); this closes the loop on the
 * remaining rows too.
 */
object TorchOracle {

  private def fmt(f: Float): String = {
    val s = f.toString
    if (s.contains("E") || s.contains(".")) s else s + ".0"
  }

  /** Balanced sum tree: a left-folded 128-term chain exceeds DuckDB's
   * binder recursion limit (128); pairwise splitting keeps depth ~log2 n. */
  private def balancedSum(ts: IndexedSeq[String]): String =
    if (ts.length == 1) ts.head
    else {
      val (l, r) = ts.splitAt(ts.length / 2)
      s"(${balancedSum(l)}+${balancedSum(r)})"
    }

  /** SELECT items computing one dense layer from columns `{p}0..{p}{in-1}`
   * into the same names (new CTE scope). */
  private def layerExprs(l: LinearLayer, p: String, relu: Boolean): Seq[String] =
    (0 until l.outDim).map { o =>
      val terms = fmt(l.bias(o)) +: (0 until l.inDim)
        .map(k => s"${fmt(l.weight(o * l.inDim + k))}*$p$k").toIndexedSeq
      val affine = balancedSum(terms)
      (if (relu) s"GREATEST(0, $affine)" else affine) + s" AS $p$o"
    }

  /** First-max-wins argmax over `{p}0..{p}{n-1}` — matches ArgMax's
   * ties-first semantics (reference argmax.rs:58-60). */
  private def argmaxCase(p: String, n: Int): String =
    (0 until n - 1).map { i =>
      val conds = (i + 1 until n).map(j => s"$p$i >= $p$j").mkString(" AND ")
      s"WHEN $conds THEN $i"
    }.mkString("CASE ", " ", s" ELSE ${n - 1} END")

  /**
   * Full oracle query. `inp` feeds each arm's input columns
   * (`{prefix}0..{prefix}{inDim-1}`); every arm's forward runs through
   * the shared CTE chain; `finalSelect` sees `carry` columns plus the
   * per-arm argmax via {{{argmax(prefix)}}} from [[armArgmax]].
   */
  def mlpArgmaxSql(
      m: TorchScriptModel,
      inpSelect: String, // SELECT ... feeding arm inputs (+ carried cols)
      arms: Seq[String], // input-column prefixes
      carry: Seq[String], // columns passed through every layer CTE
      finalSelect: String): String = {
    // The CTE chain is built from m.layers with ReLU hardwired between
    // consecutive linears — any other op (ParamActOp, ScaleShiftOp,
    // LayerNormOp, Softmax, trailing activation) would be silently
    // DROPPED, producing a wrong oracle. Require the exact shape.
    val expected: Seq[TorchOp] =
      m.layers.init.flatMap(l => Seq(l, ActOp("relu"))) :+ m.layers.last
    require(m.ops.length == expected.length && m.ops.zip(expected).forall {
      case (a: LinearLayer, b: LinearLayer) => a eq b
      case (ActOp("relu"), ActOp("relu"))   => true
      case _                                => false
    }, s"SQL oracle generation supports exactly alternating Linear/ReLU " +
      s"stacks ending in Linear; got ops=${m.ops.map(_.getClass.getSimpleName)}")
    val n = m.layers.length
    val ctes = (0 until n).map { li =>
      val l = m.layers(li)
      val sels = carry ++ arms.flatMap(p => layerExprs(l, p, relu = li < n - 1))
      val from = if (li == 0) "inp" else s"l$li"
      s"l${li + 1} AS (SELECT ${sels.mkString(", ")} FROM $from)"
    }
    s"WITH inp AS ($inpSelect),\n${ctes.mkString(",\n")}\n$finalSelect"
  }

  def armArgmax(m: TorchScriptModel, p: String): String = argmaxCase(p, m.outDim)

  /** First-max-wins argmax over a RESTRICTED arm set — the
    * constrained-decoding oracle: banned vocabulary ids simply do not
    * appear in the CASE, exactly the engine's skip. */
  def armArgmaxRestricted(p: String, allowed: Seq[Int]): String = {
    val a = allowed.sorted
    require(a.nonEmpty, "empty allowed set")
    a.init.map { i =>
      val conds = a.filter(_ > i).map(j => s"$p$i >= $p$j").mkString(" AND ")
      s"WHEN $conds THEN $i"
    }.mkString("CASE ", " ", s" ELSE ${a.last} END")
  }

  def lastCte(m: TorchScriptModel): String = s"l${m.layers.length}"
}
