package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-13 second-wave scale stress — the new attention paths and LM
 * statistics at 20-100x the bench scale:
 *
 *  1. RoPE-causal and ALiBi-masked attention inference over 500k
 *     16-token rows (per-row-bounded L x L attention, batched
 *     mapPartitions, rotation/bias tables broadcast once with the
 *     model); class mixes sanity-checked.
 *  2. GQA encoder block (q171 model) over the same rows — the shared
 *     kv heads cost the same GEMM volume as full MHA here, proving
 *     the layout adds no overhead.
 *  3. Kneser-Ney bigram scoring over 500k docs x 30 tokens with a
 *     ~2M-bigram-type table — the checkpointed-type-table plan: the
 *     corpus explode runs exactly twice however many statistics
 *     derive from it; every doc scored, planted repetitive docs (the
 *     same 10-token loop) must score more fluent (lower nll) than
 *     the median unique-vocabulary doc.
 *  4. DSIR selection over the same corpus with a 10% target slice of
 *     distinctive vocabulary: the planted target-vocab docs (in and
 *     out of the slice) must all be selected, the unique-vocab
 *     background not.
 *
 * Run: SPARK_DRIVER_MEM=28g sbt "Test/runMain graft.StressR14"
 */
object StressR14 {

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

    graft.functions.ArgMax.register(spark)
    val toks = spark.range(500000L).select(col("id").as("doc_id"),
      transform(sequence(lit(0), lit(15)),
        i => pmod(col("id") * 131L + i * 37L, lit(64L))).as("tok_ids"))

    // ---- 1. RoPE + ALiBi heads at 500k rows ----
    for ((name, model) <- Seq(
        "rope-causal" -> SparkEntry.ropeModel,
        "alibi" -> SparkEntry.alibiModel)) {
      val bc = spark.sparkContext.broadcast(model)
      val counts = timed(s"$name attention inference 500k x 16 tokens") {
        graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", bc, batchSize = 256)
          .select(call_function("argmax", col("logits")).as("c"))
          .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      }
      println(s"[stress] $name classes: $counts")
      require(counts.values.sum == 500000L && counts.size >= 2,
        s"$name degenerate at volume: $counts")
    }

    // ---- 2. GQA encoder block (vocab 32, cap 12 like q171) ----
    val toks32 = toks.select(col("doc_id"),
      slice(transform(col("tok_ids"), t => pmod(t, lit(32L))), 1, 12).as("tok_ids"))
    val gqaBc = spark.sparkContext.broadcast(SparkEntry.gqaModel)
    val gqaCounts = timed("GQA encoder inference 500k x 12 tokens") {
      graft.torch.Torch.inferBatched(toks32, "tok_ids", "logits", gqaBc, batchSize = 256)
        .select(call_function("argmax", col("logits")).as("c"))
        .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    println(s"[stress] gqa classes: $gqaCounts")
    require(gqaCounts.values.sum == 500000L && gqaCounts.size >= 2,
      s"GQA degenerate at volume: $gqaCounts")

    // ---- 3. Kneser-Ney at 500k docs / ~15M bigram occurrences ----
    // background docs walk a 4k-word pool with POSITION-VARYING
    // strides (i²-term), so every left word accumulates ~30 distinct
    // continuations across the corpus — diffuse, high-entropy bigram
    // statistics; 1k planted docs (own "p" vocabulary) repeat ONE
    // 10-token loop three times — near-deterministic continuations,
    // the fluent end of the KN scale
    val pool = 4000L
    val bg = spark.range(499000L).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(29)),
        i => concat(lit("t"),
          pmod(col("id") * 7919L + i * i * 104729L + i * 31L, lit(pool)))),
        " ").as("text"))
    val planted = spark.range(1000L).select((col("id") + 900000000L).as("doc_id"),
      array_join(flatten(array_repeat(transform(sequence(lit(0), lit(9)),
        i => concat(lit("p"), pmod(col("id") * 13L + i, lit(100L)))), 3)),
        " ").as("text"))
    val docs = bg.unionByName(planted)
    val kn = timed("knBigramScore 500k docs x 30 tokens") {
      operators.LmScore.knBigramScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("kn_nll")).collect()
    }
    require(kn.length == 500000L, s"scored ${kn.length} docs")
    val (plantedNll, bgNll) = kn.partition(_.getLong(0) >= 900000000L)
    val bgMedian = bgNll.map(_.getDouble(1)).sorted.apply(bgNll.length / 2)
    val plantedMax = plantedNll.map(_.getDouble(1)).max
    require(plantedNll.length == 1000 && plantedMax < bgMedian,
      s"planted repetitive docs (max nll $plantedMax) must score more " +
        s"fluent than the background median ($bgMedian)")
    println(f"[stress] KN: planted max nll $plantedMax%.3f < bg median $bgMedian%.3f")

    // ---- 4. DSIR at 500k docs: 10% distinctive target slice ----
    // target slice (doc_id % 10 == 0) draws from its own 500-word
    // vocabulary; 500 planted OUT-OF-SLICE docs use that same
    // vocabulary and must be selected by CONTENT
    val corpus = spark.range(499500L).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0,
        array_join(transform(sequence(lit(0), lit(19)),
          i => concat(lit("tgt"), pmod(col("id") * 31L + i, lit(500L)))), " "))
        .otherwise(array_join(transform(sequence(lit(0), lit(19)),
          i => concat(lit("bg"), pmod(col("id") * 17L + i * 3L, lit(100000L)))), " "))
        .as("text"))
    val plantedTgt = spark.range(500L).select((col("id") + 900000000L).as("doc_id"),
      array_join(transform(sequence(lit(0), lit(19)),
        i => concat(lit("tgt"), pmod(col("id") * 29L + i, lit(500L)))), " ").as("text"))
    val all = corpus.unionByName(plantedTgt)
    val sel = timed("DSIR importanceScore 500k docs") {
      operators.Dsir.importanceScore(all, "doc_id", "text",
          col("doc_id") % 10 === 0 && col("doc_id") < 900000000L)
        .select(col("doc_id"), col("selected")).collect()
    }
    require(sel.length == 500000L, s"scored ${sel.length} docs")
    val byId = sel.map(r => r.getLong(0) -> r.getBoolean(1))
    val plantedSel = byId.filter(_._1 >= 900000000L)
    require(plantedSel.forall(_._2),
      s"${plantedSel.count(!_._2)} planted target-vocab docs not selected")
    val bgSel = byId.filter { case (id, _) => id < 900000000L && id % 10 != 0 }
    val bgSelFrac = bgSel.count(_._2).toDouble / bgSel.length
    require(bgSelFrac < 0.01,
      f"background selection fraction $bgSelFrac%.4f should be ~0")
    println(f"[stress] DSIR: all 500 planted selected; background frac $bgSelFrac%.4f")

    spark.stop()
    println("[stress] StressR14 PASS")
  }
}
