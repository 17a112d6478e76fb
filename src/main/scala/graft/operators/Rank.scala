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
    // Iteration-loop partitioning (opt guide §2.4 "two operations keyed
    // the same way share one exchange"): pre-partition the cached
    // transition matrix by the join key (src) and the node/rank frames
    // by node, at a partition count DERIVED FROM THE DATA (~1M keyed
    // rows per task of pure arithmetic — scale-adaptive, not a local or
    // cluster constant). Every iteration's join then reuses the cached
    // layout instead of re-shuffling the edge table, and the one real
    // exchange per iteration (contributions keyed to dst) runs at the
    // loop's own width rather than spark.sql.shuffle.partitions — at
    // fixture scale that is 1 task instead of 32 per stage (measured
    // 915 tasks/78 jobs for q160's 12 iterations before the change).
    // cache BEFORE the sizing count so the repartitioned copy reads the
    // cached rows instead of recomputing the edge aggregation
    val trans0 = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("p"))
      .cache()
    val nEdges = trans0.count() // one pass over the (bounded) edge domain
    val loopParts = math.max(1L, math.min(nEdges / (1L << 20) + 1L,
      Int.MaxValue.toLong)).toInt
    val trans = trans0.repartition(loopParts, col("src")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(loopParts, col("node")).cache()
    val n = nodes.count() // bounded by the node-domain cardinality
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contrib0 = trans.join(ranks, col("src") === col("node"))
        .repartition(loopParts, col("dst"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("p")).as("m"))
        .withColumnRenamed("dst", "cnode")
      ranks =
        if (dangling) {
          // mass conservation makes Σ ranks == 1 every iteration (in
          // exact arithmetic; fp drift ~1e-15/step, far under the
          // report rounding), so the dangling mass is DERIVED from the
          // contributions alone: D = 1 − Σ m (the mass that no
          // out-edge carried forward) — `ranks` is read once per
          // iteration and the old dangling-node anti-join pass is
          // gone. `contrib` IS read twice (rank update + mass
          // aggregate), which would square the plan per iteration —
          // the LAZY checkpoint truncates it to an RDD scan computed
          // once at execution, with NO per-iteration materialization
          // job (the previous formulation's eager checkpoint ran 10
          // jobs where this plan runs one).
          // the lazy checkpoint truncates lineage but FORGETS the
          // hash layout (LogicalRDD reports UnknownPartitioning, so the
          // downstream join would re-shuffle BOTH sides at
          // spark.sql.shuffle.partitions) — re-key the tiny aggregated
          // frame at the loop's own width so the join stays
          // co-partitioned with the cached `nodes`
          val contrib = Checkpoints.cp(contrib0)
            .repartition(loopParts, col("cnode"))
          val dm = contrib.agg(
            coalesce(lit(1.0d) - sum("m"), lit(1.0d)).as("dm"))
          nodes.join(contrib, col("node") === col("cnode"), "left")
            .crossJoin(broadcast(dm))
            .select(col("node"),
              (lit((1.0 - d) / n) + lit(d) *
                (coalesce(col("m"), lit(0.0)) + col("dm") / n)).as("rank"))
        } else {
          nodes.join(contrib0, col("node") === col("cnode"), "left")
            .select(col("node"),
              (lit((1.0 - d) / n) + lit(d) * coalesce(col("m"), lit(0.0))).as("rank"))
        }
      // both variants read `ranks` once; the periodic truncation only
      // bounds analysis/codegen time on convergence-length runs (and,
      // like the lazy cp above, drops the hash layout — re-key so the
      // remaining iterations stay co-partitioned)
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true).repartition(loopParts, col("node"))
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
