package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-mix rebalancing: down-sample each stratum (language, source,
 * domain, ...) so the kept corpus approaches target proportions — the
 * "data mixing" step of training-corpus assembly.
 *
 * Given target shares p_s, the largest total consistent with every
 * stratum's supply is `T = min_s(N_s / p_s)`; each stratum then keeps
 * `rate_s = p_s * T / N_s` of its rows (the binding stratum keeps
 * 100%). Selection is an md5-bucket threshold — deterministic across
 * engines and runs, no RNG state, embarrassingly parallel; kept counts
 * match the target in expectation (hash-binomial noise, the standard
 * contract of hash sampling).
 *
 * Plan shape: one groupBy over the stratum column (tiny result), the
 * rate table broadcast back, a scan-side filter. No wide shuffle.
 */
object Mix {

  /** @param targets stratum -> target share (must cover every stratum
    *        present; shares need not sum to 1 — only ratios matter). */
  def rebalance(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive shares")
    val spark = df.sparkSession
    val targetDf = spark.createDataFrame(targets.toSeq.sortBy(_._1))
      .toDF(stratumCol, "__p")

    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
      .join(targetDf, Seq(stratumCol)) // inner: unknown strata are dropped
    val t = counts.agg(min(col("__n") / col("__p")).as("__T"))
    // Keep-rate quantized to 1e8 buckets — integer thresholds keep the
    // bucket comparison exact across engines. The resolution matters:
    // the previous 1/10000 grid FLOORED, so a stratum whose rate fell
    // below 1e-4 (a heavy stratum against a tiny binding one) kept
    // ZERO rows instead of its target share, and the binding stratum's
    // mathematically-1.0 rate could land at 0.9999... in doubles and
    // floor to 9999, shaving the one stratum documented to keep 100%.
    // round() fixes the binding stratum; 1e8 buckets (mod 1e8 of the
    // 32-bit md5 prefix — ~2.3% residue non-uniformity, 43 vs 42
    // preimages, the standard hash-sampling noise) make sub-1e-4 rates
    // representable. greatest(...,1): a rate that still rounds to zero
    // (< 0.5e-8 — a pathological heavy-vs-tiny mix) keeps at least
    // bucket 0 instead of silently deleting the stratum; targets are
    // required positive, so "present with nonzero share" always means
    // "at least one bucket survives".
    val rates = counts.crossJoin(broadcast(t))
      .withColumn("__rate_b",
        greatest(
          least(round(col("__p") * col("__T") / col("__n") * 100000000L).cast("long"),
            lit(100000000L)),
          lit(1L)))
      .select(col(stratumCol), col("__rate_b"))

    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100000000L
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(bucket < col("__rate_b"))
      .drop("__rate_b")
  }

  /**
   * Temperature-flattened mixture sampling: derive each stratum's keep
   * rate from its own size — `rate_s = min_t(N_t^(1-tau)) / N_s^(1-tau)`,
   * i.e. sample strata proportionally to `N^tau` — the multilingual /
   * multi-domain training recipe (the exponentiated-share mix of
   * multilingual LM pipelines). tau = 1 keeps the natural mix
   * untouched; tau -> 0 flattens toward equal per-stratum counts;
   * tau > 1 sharpens toward the head. Unlike [[rebalance]], there are
   * no explicit target shares: the stratum sizes plus one scalar ARE
   * the policy. Sampling is without replacement, so the binding
   * stratum (the smallest for tau < 1, the largest for tau > 1) keeps
   * 100% and nothing is up-sampled.
   *
   * Selection is [[rebalance]]'s md5-bucket threshold on the same 1e8
   * grid — deterministic, no RNG, scan-side. Plan shape: one tiny
   * groupBy for counts, rates broadcast back, scan-side filter; no
   * wide shuffle.
   *
   * Cross-engine exactness: for tau = 0.5 (the common flattening
   * temperature) the weight is computed with `sqrt` — correctly
   * rounded IEEE on both engines, so the 1e8-grid rate is
   * bit-identical to an independent SQL restatement. General tau uses
   * `pow`, whose cross-libm last-ulp drift could in principle flip a
   * rate by one 1e-8 bucket (~N_s/1e8 rows in expectation — the
   * hash-sampling noise class, accepted and documented).
   */
  def temperatureSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      tau: Double): DataFrame = {
    require(tau > 0.0, "tau must be > 0")
    val expo = 1.0 - tau
    if (expo == 0.0) return df // natural mix: every rate is exactly 1
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w",
        if (expo == 0.5) sqrt(col("__n").cast("double"))
        else pow(col("__n").cast("double"), lit(expo)))
    val minw = counts.agg(min(col("__w")).as("__minw"))
    val rates = counts.crossJoin(broadcast(minw))
      .withColumn("__rate_b",
        greatest(
          least(round(col("__minw") / col("__w") * lit(100000000L)).cast("long"),
            lit(100000000L)),
          lit(1L)))
      .select(col(stratumCol), col("__rate_b"))
    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100000000L
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(bucket < col("__rate_b"))
      .drop("__rate_b")
  }

  /**
   * Epoch upsampling — the LLaMA-recipe mixture knob (Touvron et al.
   * 2023 sample Wikipedia/Books at ~2 epochs while CommonCrawl stays
   * under 1): each stratum gets a REAL epoch count `e`; every doc
   * receives `floor(e)` copies plus one more iff its deterministic
   * md5 bucket falls under `frac(e)` (the [[rebalance]] hash-
   * threshold recipe — no RNG state, reproducible across engines and
   * runs, and a doc's extra copy is stable under corpus growth).
   * Strata absent from the map default to 1.0 epoch. Returns the
   * input plus `n_copies` (0 allowed: e < 1 downsamples); callers
   * explode to physical copies at shard-write time.
   */
  def epochUpsample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      epochs: Map[String, Double],
      defaultEpochs: Double = 1.0): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 100.0),
      "epoch counts must be in [0, 100]")
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val whole = floor(e).cast("long")
    // frac(e) on the same 1e8 grid as rebalance; round keeps the
    // threshold exact for the dyadic/decimal epoch counts in practice
    val fracB = round((e - floor(e)) * 100000000L).cast("long")
    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100000000L
    df.withColumn("n_copies",
      whole + when(bucket < fracB, 1L).otherwise(0L))
  }

  /**
   * Token-budget sampling: per stratum, keep documents — in a
   * DETERMINISTIC hash order — until the stratum's token budget is
   * exhausted (the "cap each source at N tokens" primitive of corpus
   * assembly, complementing [[rebalance]]'s proportional row
   * sampling).
   *
   * A doc is kept when the running token total of hash-earlier docs in
   * its stratum is still below the budget, so each stratum overshoots
   * by at most one document and the selection is reproducible across
   * engines/runs (md5 order, no RNG). Output: input columns +
   * `tokens_before` (the prefix total that admitted the doc).
   *
   * Plan shape: NOT one window per stratum — with ~5 sources at
   * 100 TB that is five serial multi-TB sorted scans. Instead the
   * two-level prefix sum [[Pack.packBins]] proved: (1) per-(stratum,
   * hex-block) token totals — an ordinary parallel aggregate over
   * <= 65536 blocks per stratum; (2) a running offset across those
   * TINY per-block totals; (3) a block-local running sum plus the
   * broadcast block offset — parallel across strata x blocks. The
   * block id is a monotone prefix of the md5 sort key and token
   * counts are longs (exact addition), so the result is
   * BIT-IDENTICAL to the naive per-stratum window (spec-asserted).
   */
  def tokenBudgetSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      budgetPerStratum: Long): DataFrame = {
    require(budgetPerStratum >= 1, "budget must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__tok", tokensCol.cast("long"))
      // a row whose token count is NULL (or casts to NULL) cannot be
      // budgeted — admitting it for free would let a stratum of
      // null-count docs keep unbounded rows "under budget"; excluded
      // rather than admitted, the conservative reading of the cap
      .filter(col("__tok").isNotNull)
      .withColumn("__key", md5(col(idCol).cast("string")))
      .withColumn("__blk", Shuffle.hexBlock(col("__key")))
    val wOff = Window.partitionBy(stratumCol)
      .orderBy(col("__blk").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(stratumCol), col("__blk"))
      .agg(sum("__tok").as("__bt"))
      .withColumn("__boff", coalesce(sum("__bt").over(wOff), lit(0L)))
      .select(col(stratumCol).as("__so"), col("__blk").as("__bo"), col("__boff"))
    // null-safe on BOTH keys: a null id hashes to a null key/block but
    // still belongs to its stratum, and a NULL stratum is itself a
    // stratum under Window.partitionBy (null-grouping) — an equi-join
    // on either key would silently drop those rows
    val wIn = Window.partitionBy(col(stratumCol), col("__blk"))
      .orderBy(col("__key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets),
        col(stratumCol) <=> col("__so") && col("__blk") <=> col("__bo"))
      .withColumn("tokens_before",
        col("__boff") + coalesce(sum(col("__tok")).over(wIn), lit(0L)))
      .filter(col("tokens_before") < budgetPerStratum)
      .drop("__tok", "__key", "__blk", "__so", "__bo", "__boff")
  }

  /**
   * WEIGHTED sampling without replacement (Efraimidis & Spiliotis
   * 2006, the A-ES priority scheme): each row draws a deterministic
   * md5 uniform `u ∈ [1e-6, 1]` and takes priority key `-ln(u) / w`;
   * the n SMALLEST keys are the sample — distributed across rows
   * exactly as sampling-without-replacement proportional to `w`
   * (quality scores, token counts, dedup-cluster sizes). The
   * per-row knob [[rebalance]]'s stratum rates can't express:
   * "keep 100k docs, quality-weighted".
   *
   * Determinism discipline: `u` lives on the 1e6 grid (md5 of the id,
   * never RNG state), the key QUANTIZES to 6 dp before the pick
   * (cross-libm ln drift dies on the grid), ties break by id. Plan
   * shape: scan-side key computation + `orderBy(key).limit(n)` — a
   * TakeOrderedAndProject (per-partition top-n, one tiny driver
   * merge), never a full sort. Rows with NULL or non-positive weight
   * cannot be prioritized and are excluded (the conservative reading,
   * like [[tokenBudgetSample]]'s null rule).
   *
   * @return the sampled rows + `skey` (the 6dp priority key)
   */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: org.apache.spark.sql.Column,
      n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L + 1L).cast("double") / 1000000.0
    val w = weightCol.cast("double")
    df.withColumn("__w", w)
      .filter(col("__w").isNotNull && col("__w") > 0.0)
      .withColumn("skey", round(-log(u) / col("__w"), 6))
      .orderBy(col("skey"), col(idCol))
      .limit(n)
      .drop("__w")
  }
}
