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
 * probabilities, damping `d`, uniform teleport `(1-d)/N`, and NO
 * dangling-mass redistribution (a node with no out-edges leaks its
 * damped mass — the common simple-implementation variant, stated
 * identically in SQL). Nodes = union of edge endpoints.
 *
 * Scale shape: the transition matrix is computed once and cached;
 * every iteration shuffles only (edges + nodes) keyed rows — no
 * collect, no broadcast of data-sized state. The one driver scalar is
 * the node COUNT (needed inside the teleport literal). For the q152
 * use (a token-transition graph) the node set is the vocabulary —
 * orders of magnitude smaller than the corpus that produced the
 * edges; the corpus-scale work is the edge extraction, a scan +
 * partial-agg like any other keyed count.
 */
object Rank {

  /** @param edges (src, dst, weight) — weight > 0, duplicates summed.
    * @return (node, rank) after exactly `iters` iterations from the
    *         uniform 1/N start. */
  def weightedPageRank(edges: DataFrame, d: Double, iters: Int): DataFrame = {
    require(d > 0 && d < 1 && iters >= 1, s"bad pagerank params d=$d iters=$iters")
    val e = edges.groupBy("src", "dst").agg(sum("weight").as("w"))
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val trans = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("p"))
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count() // bounded by the node-domain cardinality
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = trans.join(ranks, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("p")).as("m"))
        .withColumnRenamed("dst", "cnode")
      ranks = nodes.join(contrib, col("node") === col("cnode"), "left")
        .select(col("node"),
          (lit((1.0 - d) / n) + lit(d) * coalesce(col("m"), lit(0.0))).as("rank"))
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
