package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-13 scale stress — the VERDICT-r12 PageRank-hardening ask:
 * a 100k-node graph with 30% DANGLING nodes (ids >= 70k never appear
 * as src), 50 iterations — the convergence-length run that used to
 * build a linearly-deep (or, with the dangling read, exponentially-
 * deep) un-checkpointed plan. The periodic localCheckpoint keeps
 * per-iteration analysis O(1); the dangling redistribution keeps the
 * total mass at exactly 1 where the simple variant drains ~30% of it.
 *
 * Run: SPARK_DRIVER_MEM=28g sbt "Test/runMain graft.StressR13"
 */
object StressR13 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // 70k source nodes x 6 out-edges, dst hashed over the full 100k id
    // space -> every id in [70k, 100k) that appears is dangling
    val edges = spark.range(70000L)
      .select(col("id"), explode(sequence(lit(0), lit(5))).as("j"))
      .select(concat(lit("n"), col("id")).as("src"),
        concat(lit("n"),
          pmod(col("id") * 2654435761L + col("j") * 40503L + 17L, lit(100000L)))
          .as("dst"),
        lit(1.0).as("weight"))

    val ranks = timed("dangling PageRank 100k nodes / 420k edges, 50 iters") {
      operators.Rank.weightedPageRank(edges, d = 0.85, iters = 50,
        dangling = true).collect()
    }
    val n = ranks.length
    require(n > 99000 && n <= 100000, s"node set $n not ~100k")
    val mass = ranks.map(_.getDouble(1)).sum
    require(math.abs(mass - 1.0) < 1e-6,
      s"dangling variant must conserve mass, got $mass")
    println(f"[stress] dangling pagerank: $n nodes, mass $mass%.9f")

    val leaky = timed("default PageRank same graph, 50 iters") {
      operators.Rank.weightedPageRank(edges, d = 0.85, iters = 50).collect()
    }
    val leakMass = leaky.map(_.getDouble(1)).sum
    require(leakMass < 0.75, s"simple variant should drain ~30%% of mass " +
      s"through 30k dangling nodes, got $leakMass")
    println(f"[stress] leaky pagerank: mass $leakMass%.9f (drained as expected)")

    spark.stop()
  }
}
