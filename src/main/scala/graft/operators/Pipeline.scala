package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The composed training-data pipeline — the end-to-end shape this
 * library exists for, wiring the individual operators together:
 *
 *  1. exact dedup (first occurrence per normalized text);
 *  2. near-dup removal (MinHash-LSH pairs -> drop the higher id of
 *     each pair, i.e. keep the earliest member of every dup cluster
 *     edge);
 *  3. quality filter (composite score + repetition ratio);
 *  4. deterministic hash split (train/val/test);
 *  5. token packing into ~capacity-token bins (per split).
 *
 * Every stage is a stock DataFrame transform over the operators in
 * this package, so the whole pipeline is one lazy plan (plus the
 * checkpointed near-dup intermediates) — no driver-side loops, no
 * collect, shuffles only where the semantics require them.
 */
object Pipeline {

  /**
   * @return the packed training corpus:
   *         (doc_id, text, split, n_tokens, bin)
   */
  def prepareTrainingData(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      nearDupThreshold: Double = 0.8,
      minQuality: Double = 0.3,
      maxRepetition: Double = 0.5,
      packCapacity: Long = 2048L): DataFrame = {
    val spark = docs.sparkSession

    // 1. exact dedup on the normalized text
    val exact = Dedup.firstPerKey(
      docs.withColumn("__norm", md5(lower(trim(col(textCol))))),
      Seq("__norm"), idCol).drop("__norm")

    // 2. near-dup removal: every LSH-verified pair (a < b) votes to
    //    drop b — an anti-join, not a collect
    val dupIds = Dedup
      .minHashLshPairs(exact, idCol, textCol, shingleN, nearDupThreshold)
      .select(col("b").as(idCol)).distinct()
    val deduped = exact.join(dupIds, Seq(idCol), "left_anti")

    // 3. quality + repetition gates (pure column arithmetic)
    val total2 = TextOps.strictTokenCount(col(textCol)) - 1
    val d2 = size(graft.functions.Shingles.shingles(spark, col(textCol), 2))
    val rep2 = when(total2 > 0,
      lit(1.0) - d2.cast("double") / total2.cast("double")).otherwise(lit(0.0))
    val filtered = deduped
      .filter(TextOps.qualityScore(col(textCol)) >= minQuality)
      .filter(rep2 <= maxRepetition)

    // 4. deterministic split (16/2/2 of 20 md5 buckets)
    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10).cast("int") % 20
    val split = when(bucket < 16, "train").when(bucket < 18, "val").otherwise("test")
    // Checkpointed: FOUR consumers read this frame (three per-split
    // packBins passes + the final join), and without it each one
    // re-runs the whole dedup chain above — scan, exact dedup window,
    // LSH banding, candidate verification, anti join. Same lifecycle
    // note as [[Dedup]]: blocks are freed when the result is dropped.
    val withSplit = filtered.withColumn("split", split).transform(Checkpoints.cp)

    // 5. pack each split into ~capacity-token bins — ONE partitioned
    //    two-level prefix sum over all splits (a per-split loop would
    //    triple the plan: 3x the windows, joins, and broadcasts)
    val packed = Pack.packBins(withSplit, idCol, TextOps.tokenCount(col(textCol)),
      packCapacity, partitionCols = Seq("split"))

    withSplit.select(col(idCol), col(textCol), col("split"))
      .join(packed.select(col(idCol), col("n_tokens"), col("bin")), Seq(idCol))
  }
}
