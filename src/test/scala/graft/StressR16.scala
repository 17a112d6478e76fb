package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-13 decode-family scale stress — generation at 500x the bench
 * scale:
 *
 *  1. Greedy 3-step generation over 500k 12-token rows: the k-step
 *     loop must stay ONE mapPartitions job (no per-step plan growth),
 *     every row emits 3 tokens.
 *  2. Beam search 2x2 over the same rows: all beams batch through one
 *     forward per step; beam-1's first token must equal greedy's
 *     (argmax == top log-prob) on EVERY row.
 *  3. Speculative decoding with the int4 draft: acceptance telemetry
 *     aggregates; the n=2 rows must be the majority (the draft is the
 *     target on a coarser grid, not a stranger).
 *
 * Run: SPARK_DRIVER_MEM=28g sbt "Test/runMain graft.StressR16"
 */
object StressR16 {

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

    val m = SparkEntry.genModel
    val bcT = spark.sparkContext.broadcast(m)
    val bcD = spark.sparkContext.broadcast(graft.torch.TorchQuant.quantize(m, 7))
    val vocab = m.seqHead.get.vocab
    val toks = spark.range(500000L).select(col("id").as("doc_id"),
      transform(sequence(lit(0), lit(11)),
        i => pmod(col("id") * 131L + i * 37L, lit(vocab.toLong))).as("tok_ids"))

    val greedy = graft.torch.Torch.generateGreedy(toks, "tok_ids", "gen", bcT,
        steps = 3, batchSize = 512)
      .select(col("doc_id"), col("gen")).cache()
    val nG = timed("greedy 3-step generation, 500k x 12 tokens")(greedy.count())
    require(nG == 500000L, s"greedy dropped rows: $nG")
    require(greedy.filter(size(col("gen")) =!= 3).count() == 0, "short generations")

    val beams = graft.torch.Torch.beamSearch(toks, "tok_ids", "beams", bcT,
        steps = 2, width = 2, batchSize = 512)
      .select(col("doc_id"), col("beams")).cache()
    require(timed("beam search 2x2, 500k rows")(beams.count()) == 500000L,
      "beam dropped rows")
    val disagree = beams.join(greedy, "doc_id")
      .filter(col("beams")(0)(0) =!= col("gen")(0)).count()
    require(disagree == 0, s"beam-1 step-1 != greedy argmax on $disagree rows")

    val spec = timed("speculative decode (int4 draft), 500k rows") {
      val drafted = graft.torch.Torch.generateGreedy(toks, "tok_ids", "draft",
        bcD, steps = 2, batchSize = 512)
      val s1 = drafted.withColumn("seq1",
        concat(col("tok_ids"), slice(col("draft").cast("array<bigint>"), 1, 1)))
      graft.functions.ArgMax.register(spark)
      val v1 = graft.torch.Torch.inferBatched(s1, "tok_ids", "l1", bcT, 512)
        .withColumn("t1", call_function("argmax", col("l1"))).drop("l1")
      val v2 = graft.torch.Torch.inferBatched(v1, "seq1", "l2", bcT, 512)
        .withColumn("t2", call_function("argmax", col("l2"))).drop("l2")
      v2.select(
        when(col("t1") =!= col("draft")(0), 0)
          .when(col("t2") =!= col("draft")(1), 1).otherwise(2).as("n"))
        .groupBy("n").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    println(s"[stress] spec-decode acceptance: $spec")
    require(spec.values.sum == 500000L, "spec dropped rows")
    require(spec.getOrElse(2, 0L) > 250000L,
      s"int4 draft should mostly agree: $spec")

    // 4. KV-cache step scaling: the incremental session vs the full
    //    O(L²) prefix recompute, 4 steps from 12-token prompts (the
    //    position-table max). Same trajectories required BIT-exactly;
    //    the wall-clock ratio is the O(L) vs O(L²) win.
    val prompts = Array.tabulate(20000)(i =>
      Array.tabulate(12)(j => ((i * 131 + j * 37) % vocab)))
    def argmaxF(l: Array[Float]): Int = {
      var b = 0
      var j = 1
      while (j < l.length) { if (l(j) > l(b)) b = j; j += 1 }
      b
    }
    val cached = timed("KV-cache 4-step decode, 20k rows (driver)") {
      prompts.map { p =>
        val s = m.decodeSession(p)
        (1 to 4).map { _ =>
          val tid = argmaxF(s.logits()); s.append(tid); tid
        }
      }
    }
    val recomputed = timed("full-recompute 4-step decode, 20k rows (driver)") {
      prompts.map { p =>
        var cur = p
        (1 to 4).map { _ =>
          val tid = argmaxF(m.forwardTokens(cur)); cur = cur :+ tid; tid
        }
      }
    }
    require(cached.zip(recomputed).forall { case (a, b) => a == b },
      "KV-cache trajectory diverged from the recompute path")

    println("[stress] StressR16 PASS")
    spark.stop()
  }
}
