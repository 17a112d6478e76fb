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

  /**
   * Frozen DSIR statistics — the ingest-time artifact of
   * [[importanceScore]] (the [[graft.operators.LmScore.knStats]]
   * discipline): per-word `(raw, target)` counts collected once
   * (CAPPED — loud failure beats a silent driver OOM) and broadcast,
   * so arriving documents score scan-side with zero streaming state
   * and never shift the distributions they are judged against.
   */
  final case class DsirStats(
      counts: Map[String, (Double, Double)],
      nr: Double, nt: Double, v: Double)

  /** Collect [[DsirStats]]; fails loudly past `maxVocab` distinct
    * words (size-check BEFORE the collect).
    *
    * 100 TB contract: a web-scale vocabulary exceeds 2M types — set
    * `pruneTo` to keep the top-N words by raw-corpus count (ties by
    * word text, a total order: the artifact is deterministic). The
    * pruned artifact IS the model — nr/nt/v are the kept table's
    * totals, and dropped words fall through the same OOV smoothing as
    * unseen ones. The prune runs distributed (orderBy + limit =
    * TakeOrderedAndProject). */
  def dsirStats(df: DataFrame, textCol: String, targetPred: Column,
      maxVocab: Int = 2000000, pruneTo: Int = -1): DsirStats = {
    val freqAll = df.select(targetPred.as("__t"),
        explode(call_function("regexp_extract_all",
          col(textCol), lit(Tok.Pattern), lit(0))).as("w"))
      .groupBy("w").agg(
        count(lit(1)).as("cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
      .transform(Checkpoints.cp)
    val freq =
      if (pruneTo > 0) freqAll.orderBy(col("cr").desc, col("w")).limit(pruneTo)
      else freqAll
    // round-20: ONE collect instead of count-then-collect — the limit
    // caps the driver transfer at maxVocab+1 rows (the size check now
    // guards the collect ITSELF, strictly safer than counting first),
    // and CollectLimit concatenates partitions in the same order as
    // collect(), so the order-sensitive nr/nt sums see identical rows
    val rows = freq.limit(maxVocab + 1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1).toDouble, r.getLong(2).toDouble)))
    require(rows.length <= maxVocab,
      s"over ${rows.length - 1} distinct words exceed the frozen-stats cap $maxVocab — " +
        s"raise the cap, or pass pruneTo to keep the top-N words by count")
    DsirStats(rows.toMap,
      nr = rows.map(_._2._1).sum, nt = rows.map(_._2._2).sum,
      v = rows.length.toDouble)
  }

  /**
   * Scan-side DSIR scoring against a frozen artifact (stream-safe:
   * stateless projection). Unseen words score the add-1 floor on BOTH
   * distributions — `ln(1/(nt+v)) − ln(1/(nr+v))`, a CONSTANT
   * (positive when the raw corpus is larger: a never-seen word is
   * less surprising under the target's smaller mass — the smoothing's
   * honest answer, not a special case). `ln` is StrictMath.log, so
   * scoring the frozen corpus itself reproduces [[importanceScore]]
   * to summation-order ulps.
   */
  def withDsirFrozen(df: DataFrame, textCol: String,
      stats: DsirStats): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(stats)
    val score = udf { (toks: Seq[String]) =>
      val st = bc.value
      var acc = 0.0
      var i = 0
      while (i < toks.length) {
        val (cr, ct) = st.counts.getOrElse(toks(i), (0.0, 0.0))
        acc += StrictMath.log((ct + 1.0) / (st.nt + st.v)) -
          StrictMath.log((cr + 1.0) / (st.nr + st.v))
        i += 1
      }
      val n = toks.length
      (n, if (n == 0) 0.0
        else BigDecimal(acc / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val toks = call_function("regexp_extract_all",
      col(textCol), lit(Tok.Pattern), lit(0))
    df.withColumn("__ds", score(toks))
      .withColumn("n_tokens", col("__ds._1"))
      .withColumn("dsir_score", col("__ds._2"))
      .withColumn("selected", col("dsir_score") > 0.0d)
      .drop("__ds")
  }
}
