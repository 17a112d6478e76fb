package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-13 third-wave scale stress — the training-data operators that
 * landed after the attention wave, at 20-2000x the bench scale:
 *
 *  1. Distributed PCA over 1M x 64d vectors: the Gram pass must stay
 *     one aggregation job (fixed ~17 KB buffer per task, nothing
 *     row-shaped shuffled); a planted dominant direction must be
 *     recovered (|cos| with the plant > 0.999) and the centered
 *     projections must average to ~0.
 *  2. Count-min sketch over 1M docs x 30 tokens (~29M bigram
 *     occurrences): one pass, and the sketch estimate for planted
 *     boilerplate grams must never undercount their exact count.
 *  3. FIM + SFT rendering + char entropy over 500k docs in ONE
 *     projection — the scan-side map-stage claim: no shuffle in the
 *     plan (asserted on the physical plan string), all rows out.
 *  4. Preference pairs over 1M responses in 100k prompt groups: one
 *     shuffle, deterministic picks re-checked on a planted group.
 *
 * Run: SPARK_DRIVER_MEM=28g sbt "Test/runMain graft.StressR15"
 */
object StressR15 {

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

    // ---- 1. PCA at 1M x 64d with a planted dominant direction ----
    // x = t·u + noise, u = normalized alternating pattern; Var(t)=~33
    // dwarfs the per-dim noise, so the top component must align with u.
    val dim = 64
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -1.0)
      .map(_ / math.sqrt(dim.toDouble))
    val vecs = spark.range(1000000L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val t = (pmod(col("id"), lit(21L)) - 10L).cast("double")
        val sign = when(i % 2 === 0, lit(1.0D)).otherwise(lit(-1.0D))
        val noise = (pmod(col("id") * 131L + i * 37L, lit(7L)) - 3L)
          .cast("double") / lit(10.0D)
        ((t * sign / math.sqrt(dim.toDouble)) + noise).cast("float")
      }).as("embedding"))
    val m = timed("PCA fitTop 1M x 64d (one Gram pass + driver eig)") {
      graft.operators.Pca.fitTop(vecs, "embedding", dim = dim, iters = 8)
    }
    val cosU = math.abs(m.component.zip(u).map { case (a, b) => a * b }.sum)
    require(cosU > 0.999, s"top component missed the planted direction: |cos|=$cosU")
    val pMean = timed("PCA projection mean over 1M rows") {
      vecs.select(avg(graft.operators.Pca.projectTop(m, col("embedding"))))
        .head().getDouble(0)
    }
    require(math.abs(pMean) < 1e-6, s"projections not centered: $pMean")
    println(f"[stress] PCA: |cos(component, plant)|=$cosU%.6f evr=${m.explainedVarianceRatio}%.4f")

    // ---- 2. CMS over ~29M bigram occurrences ----
    val body = array_join(transform(sequence(lit(0), lit(29)),
      i => concat(lit("w"), pmod(col("id") * 7919L + i * 104729L, lit(50000L)))),
      " ")
    val docs = spark.range(1000000L).select(col("id").as("doc_id"),
      // planted boilerplate head on every 100th doc
      when(pmod(col("id"), lit(100L)) === 0,
        concat(lit("click here to subscribe "), body))
        .otherwise(body).as("text"))
    val grams = graft.operators.TextOps.shingles(col("text"), 2)
    val (depth, width) = (4, 4096)
    val counters = timed("CMS sketch 1M docs x ~30 bigrams") {
      docs.agg(graft.operators.Profile.Cms.cms_sketch(grams, depth, width).as("sk"))
        .selectExpr("sk.counters").head().getSeq[Long](0).toArray
    }
    val exactPlanted = 10000L // every 100th of 1M docs carries the boilerplate
    for (g <- Seq("click here", "here to", "to subscribe")) {
      val est = graft.operators.Profile.Cms.estimate(counters, depth, width, g)
      require(est >= exactPlanted, s"CMS undercounted '$g': $est < $exactPlanted")
      println(s"[stress] CMS '$g': est=$est exact>=$exactPlanted")
    }

    // ---- 3. FIM + SFT + entropy in one shuffle-free projection ----
    val combined = graft.operators.Sft.renderTurns(
      docs.withColumn("entropy", graft.operators.TextOps.charEntropy(col("text"))),
      "doc_id", "text", turnTokens = 8)
    val plan = combined.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"), s"map-stage ops shuffled:\n$plan")
    val n3 = timed("FIM + SFT render + charEntropy over 500k docs") {
      val half = docs.filter(col("doc_id") < 500000L)
      val fim = graft.operators.Noise.fimTransform(half, "doc_id", "text", 50)
        .select(col("doc_id"), col("mode"))
      val sft = graft.operators.Sft.renderTurns(half, "doc_id", "text", 8)
        .select(col("doc_id"), col("n_mask_chars"))
      val ent = half.select(col("doc_id"),
        graft.operators.TextOps.charEntropy(col("text")).as("h"))
      fim.count() + sft.count() + ent.filter(col("h") > 0).count()
    }
    require(n3 == 1500000L, s"map-stage row counts wrong: $n3")

    // ---- 4. Preference pairs at 1M responses / 100k prompts ----
    val resp = spark.range(1000000L).select(
      pmod(col("id"), lit(100000L)).as("prompt_id"),
      col("id").as("resp_id"),
      // planted group 0: known scores; elsewhere hash scores
      // prime modulus: the group stride 100000 must not divide it, or
      // every group's scores tie and nothing survives the gap filter
      when(pmod(col("id"), lit(100000L)) === 0, col("id") / lit(100000L))
        .otherwise(pmod(col("id") * 2654435761L, lit(997L)) + lit(100L))
        .cast("long").as("score"))
    val pairs = timed("preferencePairs 1M responses / 100k prompts") {
      graft.operators.Preference.pairs(resp, "prompt_id", "resp_id", "score", lit(1L))
        .cache()
    }
    val nPairs = pairs.count()
    require(nPairs > 90000L, s"too few pairs: $nPairs")
    val g0 = pairs.filter(col("prompt_id") === 0).head()
    // group 0 scores are id/100000 = 0..9 -> chosen id 900000, rejected id 0
    require(g0.getLong(1) == 900000L && g0.getLong(3) == 0L,
      s"planted group picks wrong: $g0")
    println(s"[stress] preference pairs: $nPairs groups emitted, planted group exact")

    println("[stress] StressR15 PASS")
    spark.stop()
  }
}
