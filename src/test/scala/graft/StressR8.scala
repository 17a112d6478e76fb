package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-8 scale stress:
 *
 *  1. IVFADC (the q106/q112 index) at 20x sf0.1 — a 100k-vector corpus
 *     with 500 planted scaled twins. Trains/encodes once, runs the
 *     executor-side batch query path (10% of the corpus as queries, the
 *     q112 shape), and gauges recall@5 of the planted twins. The
 *     sin-curve corpus is deliberately harsh: quasi-periodic aliasing
 *     gives some queries DENSE genuine-near-neighbor neighborhoods, so
 *     a twin (exact cosine-1 neighbor) can drop out of the ADC
 *     shortlist when >= `shortlist` candidates' ADC estimates undercut
 *     the twin's own residual-quantization error — honest ANN
 *     behavior, gated like q106 at a pinned recall floor. A second
 *     pass re-queries any missed twins at shortlist=500 through the
 *     broadcast path and requires 100%: the miss must be
 *     SHORTLIST-bounded (a tunable), never a cell-assignment bug
 *     (the twin normalizes to the query's point, so its cell is by
 *     construction inside the query's probe set).
 *
 *  2. Bounded top-k (q111/q114's Aggregator) on a 20M-row corpus where
 *     ONE source holds 90% of rows — the skew that serializes a window
 *     plan. Records the partial-aggregate output rows crossing the
 *     exchange: bounded by tasks x groups x k, NOT the row stream.
 *
 * Run: SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.StressR8"
 */
object StressR8 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- 1. IVFADC at 20x with planted twins ----
    val dim = 64
    // deterministic synthetic corpus: 100k unit-ish vectors
    val base = spark.range(100000L).select(col("id").as("vec_id"),
      array((0 until dim).map(j =>
        sin(col("id") * lit(0.7001 + j * 0.0137) + lit(j * 1.13)).cast("float")): _*)
        .as("embedding"))
    // twins: ids 0..499 re-appear as id+1_000_000 scaled by 1.7 —
    // cosine exactly 1, same normalized point, same coarse cell
    val twins = base.filter(col("vec_id") < 500)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), v => v * lit(1.7f)).as("embedding"))
    val corpus = base.unionByName(twins)

    val Sim = operators.Similarity
    val ix = timed("ivfPqTrain 100.5k vectors, nlist=64, m=8, ksub=32") {
      Sim.ivfPqTrain(corpus, "embedding", dim = dim, nlist = 64, m = 8, ksub = 32)
    }
    val codes = timed("ivfPqEncode 100.5k") {
      val c = Sim.ivfPqEncode(corpus, "vec_id", "embedding", ix).cache()
      c.count(); c
    }
    // q112 shape: every 10th vector queries the index (10k queries),
    // executor-side LUTs, exact rerank
    val queries = corpus.filter(col("vec_id") % 10 === 0 && col("vec_id") < 1000000L)
    val res = timed("ivfPqTopKBatchReranked 10k queries / 100.5k corpus, nprobe=8") {
      val r = Sim.ivfPqTopKBatchReranked(corpus, codes, queries,
        "vec_id", "embedding", ix, k = 5, shortlist = 50, nprobe = 8).cache()
      r.count(); r
    }
    val nRows = res.count()
    val nQ = res.select(countDistinct("q_id")).first().getLong(0)
    // planted-twin recall: queries 0,10,...,490 must surface their twin
    val twinHits = res.filter(col("q_id") < 500 && col("vec_id") === col("q_id") + 1000000L)
      .select(countDistinct("q_id")).first().getLong(0)
    val twinQs = queries.filter(col("vec_id") < 500).count()
    println(s"[stress] ivfpq batch: result_rows=$nRows queries=$nQ " +
      s"twin_recall=$twinHits/$twinQs")
    require(nRows == nQ * 5, s"short results: $nRows vs ${nQ * 5}")
    require(twinHits >= (twinQs * 9) / 10, s"twin recall below floor: $twinHits/$twinQs")
    // escalation: every missed twin must surface at shortlist=500 —
    // proves the miss is ADC-shortlist truncation (tunable), not a
    // probe/cell bug (which a wider shortlist could never fix)
    if (twinHits < twinQs) {
      val missedQ = queries.filter(col("vec_id") < 500)
        .join(res.filter(col("vec_id") === col("q_id") + 1000000L)
          .select(col("q_id").as("vec_id")), Seq("vec_id"), "left_anti")
      val nMissed = missedQ.count()
      val wide = timed(s"escalation: $nMissed missed twins at shortlist=500") {
        Sim.ivfPqTopKReranked(corpus, codes, missedQ,
          "vec_id", "embedding", ix, k = 5, shortlist = 500, nprobe = 8)
      }
      val recovered = wide.filter(col("vec_id") === col("q_id") + 1000000L)
        .select(countDistinct("q_id")).first().getLong(0)
      println(s"[stress] ivfpq escalation: recovered=$recovered/$nMissed")
      require(recovered == nMissed,
        s"missed twins NOT shortlist-bounded: $recovered/$nMissed — index bug")
    }

    // ---- 2. bounded top-k under 90% source skew ----
    // 20M rows, 20 sources, source s0 = 90% of rows
    val rows = spark.range(20000000L).select(col("id"),
      when(pmod(col("id"), lit(10)) < 9, lit("s_big"))
        .otherwise(concat(lit("s"), pmod(col("id"), lit(19)).cast("string"))).as("source"),
      pmod(col("id") * 2654435761L, lit(1000000007L)).as("score"))
    val capped = rows.groupBy("source")
      .agg(functions.TopKAgg.top_k(col("score"), col("id"), 20).as("top"))
      .select(col("source"), posexplode(col("top")))
    val out = timed("top_k(20) over 20M rows, one source = 90%") {
      capped.collect()
    }
    // AQE hides the executed nodes twice over: the final plan lives in
    // AdaptiveSparkPlanExec.executedPlan (not its children), and each
    // materialized stage is a LEAF QueryStageExec whose real subtree is
    // its `plan` field — a naive collect() sees only zeroed initial-plan
    // metrics. Walk through both wrappers explicitly.
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val through = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => p.children
      }
      p +: through.flatMap(allNodes)
    }
    val partialRows = allNodes(capped.queryExecution.executedPlan).collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
          if a.aggregateExpressions.exists(_.mode ==
            org.apache.spark.sql.catalyst.expressions.aggregate.Partial) =>
        a.metrics("numOutputRows").value
    }.sum
    val nGroups = out.map(_.getString(0)).distinct.length
    println(s"[stress] top_k exchange rows: partial_out=$partialRows " +
      s"(bound = tasks x $nGroups groups x 20) vs 20,000,000 input; " +
      s"result rows=${out.length}")
    require(out.length == nGroups * 20, "short top-k output")
    require(partialRows > 0 && partialRows <= 32L * nGroups * 20,
      s"exchange not bounded: $partialRows")

    // double-scored variant on the same skew (NaN-free scores)
    val cappedD = rows.groupBy("source")
      .agg(functions.TopKAgg.top_k_d(col("score").cast("double") / lit(7.0),
        col("id"), 20).as("top"))
    val outD = timed("top_k_d(20) over 20M rows, one source = 90%") {
      cappedD.select(col("source"), posexplode(col("top"))).collect()
    }
    require(outD.length == nGroups * 20, "short top_k_d output")
    spark.stop()
  }
}
