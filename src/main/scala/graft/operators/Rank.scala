package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Weighted PageRank (Page et al. 1999) over an edge list — the
 * iterative-algorithm shape of a DataFrame engine: each iteration is
 * one keyed join + one aggregation, run a FIXED number of times (the
 * deterministic, oracle-able variant; convergence-tested loops hide a
 * float-compare in control flow).
 *
 * Semantics pinned for the oracle: out-weight-normalized transition
 * probabilities, damping `d`, uniform teleport `(1-d)/N`, and — by
 * default — NO dangling-mass redistribution (a node with no out-edges
 * leaks its damped mass — the common simple-implementation variant,
 * stated identically in SQL). `dangling = true` switches to the
 * textbook-correct variant (Page et al. §2.7): each iteration the
 * damped mass sitting on no-out-edge nodes is redistributed uniformly
 * (`rank' = (1-d)/N + d·(m + D/N)` where `D = Σ rank(dangling)`), so
 * total mass stays exactly 1 and long runs cannot drain.
 *
 * Scale shape: the transition matrix is computed once and cached;
 * every iteration shuffles only (edges + nodes) keyed rows — no
 * collect, no broadcast of data-sized state. The one driver scalar is
 * the node COUNT (needed inside the teleport literal); the per-
 * iteration dangling mass is a one-row aggregate cross-joined back
 * broadcast (never collected). Every `checkpointEvery` iterations the
 * rank frame is `localCheckpoint`ed — the plan otherwise grows
 * linearly in iters and analysis/codegen time dominates past ~20
 * iterations (the convergence-run killer). For the q152
 * use (a token-transition graph) the node set is the vocabulary —
 * orders of magnitude smaller than the corpus that produced the
 * edges; the corpus-scale work is the edge extraction, a scan +
 * partial-agg like any other keyed count.
 */
object Rank {

  /** @param edges (src, dst, weight) — weight > 0, duplicates summed.
    * @param dangling redistribute dangling-node mass uniformly each
    *        iteration (mass-conserving textbook variant).
    * @param checkpointEvery truncate plan lineage with an eager
    *        `localCheckpoint` every this many iterations (<= 0 = never).
    * @return (node, rank) after exactly `iters` iterations from the
    *         uniform 1/N start. */
  def weightedPageRank(edges: DataFrame, d: Double, iters: Int,
      dangling: Boolean = false, checkpointEvery: Int = 10): DataFrame = {
    require(d > 0 && d < 1 && iters >= 1, s"bad pagerank params d=$d iters=$iters")
    val e = edges.groupBy("src", "dst").agg(sum("weight").as("w"))
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val trans = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("p"))
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count() // bounded by the node-domain cardinality
    // dangling = nodes with no out-edges (never appear as src)
    lazy val danglingNodes = nodes.join(outw.select(col("src").as("node")),
      Seq("node"), "left_anti").cache()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contrib = trans.join(ranks, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("p")).as("m"))
        .withColumnRenamed("dst", "cnode")
      val joined = nodes.join(contrib, col("node") === col("cnode"), "left")
      ranks =
        if (dangling) {
          // one-row dangling-mass aggregate, broadcast back (the
          // crossJoin(broadcast(one-row)) discipline — no collect)
          val dm = danglingNodes.join(ranks, "node")
            .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
          joined.crossJoin(broadcast(dm))
            .select(col("node"),
              (lit((1.0 - d) / n) + lit(d) *
                (coalesce(col("m"), lit(0.0)) + col("dm") / n)).as("rank"))
        } else {
          joined.select(col("node"),
            (lit((1.0 - d) / n) + lit(d) * coalesce(col("m"), lit(0.0))).as("rank"))
        }
      // dangling reads `ranks` TWICE per iteration (contrib + dm), so
      // an un-truncated plan doubles in size AND in recompute work
      // each step (2^gap between checkpoints — measured 5x wall at 50
      // iters with gap 4): checkpoint every iteration there. The
      // default variant reads ranks once; linear lineage only needs
      // the periodic truncation.
      val cpe = if (dangling) 1 else checkpointEvery
      if (checkpointEvery > 0 && i % cpe == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Corpus token-transition edges: one `(w_t, w_{t+1})` edge per
    * adjacent word pair, weights = corpus-wide counts. Scan +
    * partial-agg; the edge/node domain is the vocabulary. */
  def bigramEdges(docs: DataFrame, textCol: String): DataFrame = {
    // zip each word with its successor scan-side (no self-join): slide
    // over the word array directly
    docs.select(call_function("regexp_extract_all", col(textCol),
        lit(graft.Tok.Pattern), lit(0)).as("ws"))
      .select(explode(zip_with(
        slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
        slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
        (a, b) => struct(a.as("src"), b.as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"), lit(1.0).as("weight"))
  }
}
