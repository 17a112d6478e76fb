package graft.operators

import graft.Tok
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection (Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling"): score every raw
 * document by how much more likely its tokens are under a TARGET
 * domain's unigram distribution than under the raw corpus's own —
 * `avg_w [ ln p̂_target(w) − ln p̂_raw(w) ]` over token OCCURRENCES,
 * with add-1 smoothing over the shared corpus vocabulary. Documents
 * that "sound like" the target (positive log-likelihood ratio) are
 * kept; the published recipe resamples proportionally to
 * `exp(score)` — the score column here feeds either rule. (The paper
 * hashes n-grams into buckets; this keeps exact unigram identities —
 * same estimator, engine-exact counts, no cross-engine hash to pin.)
 *
 * The target sample is defined IN-CORPUS by a predicate (e.g.
 * `lang = 'en'` or a curated-source flag), the common bootstrapping
 * setup: use the trusted slice as the target distribution and rank
 * everything else against it.
 *
 * Numerical contract: all counts are exact integers on both engines;
 * `ln` of their exact double ratios is f64 on both (Spark's `log` is
 * `StrictMath.log` == DuckDB's `ln`); the per-doc `avg` carries
 * sum-order ulp drift absorbed by the 6-dp report rounding (the q153
 * discipline).
 *
 * Plan shape: one scan-side explode to token occurrences, ONE
 * groupBy(word) computing raw and target counts together (conditional
 * aggregation — not two passes), one-row global totals broadcast by
 * crossJoin, one keyed score join back to occurrences, one groupBy
 * fold to documents. Every shuffle is keyed on the word or the doc
 * id; the frequency table stays distributed (never collected or
 * broadcast) — at 100 TB the vocabulary is large but partitioned.
 * The occurrence stream is deliberately NOT checkpointed (the
 * rarityScore trade: re-running a pruned scan + regex beats
 * materializing a row per token).
 */
object Dsir {

  /**
   * Per-document DSIR score. Output: `idCol, n_tokens,
   * dsir_score` (6-dp), `selected` (score > 0 — "sounds more like
   * the target than the background"). Zero-token documents score 0.0
   * and are not selected.
   */
  def importanceScore(
      df: DataFrame, idCol: String, textCol: String,
      targetPred: Column): DataFrame = {
    val occ = df.select(col(idCol), targetPred.as("__t"),
        explode(call_function("regexp_extract_all",
          col(textCol), lit(Tok.Pattern), lit(0))).as("w"))

    // raw + target occurrence counts in ONE pass over the word key
    val freq = occ.groupBy("w").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))

    // one-row totals: target/raw token mass + shared vocab size
    val totals = freq.agg(
      sum(col("cr")).cast("double").as("nr"),
      sum(col("ct")).cast("double").as("nt"),
      count(lit(1)).cast("double").as("v"))

    val llr = (log((col("ct").cast("double") + lit(1.0d)) / (col("nt") + col("v")))
      - log((col("cr").cast("double") + lit(1.0d)) / (col("nr") + col("v"))))

    val perDoc = occ.join(freq, Seq("w"))
      .crossJoin(broadcast(totals))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        avg(llr).as("score"))

    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        round(coalesce(col("score"), lit(0.0d)), 6).as("dsir_score"))
      .withColumn("selected", col("dsir_score") > 0.0d)
  }
}
