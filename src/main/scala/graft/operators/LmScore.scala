package graft.operators

import graft.Tok
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-relative rarity scoring — a deterministic perplexity proxy
 * for quality filtering (the role KenLM-style LM scoring plays in
 * CCNet-like pipelines, reduced to exact integer statistics): a
 * document full of bigrams that occur nowhere else in the corpus is
 * either novel or noise, and in scraped data overwhelmingly noise.
 *
 * For each document: `n_bigrams` (token bigram occurrences, NOT
 * distinct — frequency matters for a rate), `n_rare` (occurrences
 * whose corpus-wide bigram frequency is <= rareThreshold), and
 * `rare_ratio = n_rare / n_bigrams` (floor-truncated to 6 decimals;
 * integer inputs keep it engine-exact).
 *
 * Plan shape: one pass extracts bigram occurrences (scan-side
 * explode), one groupBy counts corpus frequencies, one keyed join
 * scores occurrences, one groupBy folds back to documents. Every
 * shuffle is keyed on the bigram or the doc id — at 100 TB the
 * frequency table is large but partitioned, never collected or
 * broadcast. The occurrence stream is deliberately NOT checkpointed
 * although two consumers read it (frequency agg + scoring join):
 * re-running a pruned scan + regex is cheaper than materializing a
 * row per token — the opposite trade from the pair operators, whose
 * checkpointed intermediates are narrow signature tables.
 */
object LmScore {

  def rarityScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rareThreshold: Long): DataFrame = {
    require(rareThreshold >= 1, "rareThreshold must be >= 1")
    val ws = split(trim(col(textCol)), Tok.WsPlus)
    // NON-distinct bigram occurrences (TextOps.shingles dedups — a
    // rarity RATE needs every occurrence)
    val bgArr = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", slice(ws, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val occ = df.select(col(idCol), explode(bgArr).as("bg"))

    val freq = occ.groupBy("bg").agg(count(lit(1)).as("__c"))
    val perDoc = occ.join(freq, Seq("bg"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__c") <= rareThreshold, 1L).otherwise(0L)).as("n_rare"))

    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("rare_ratio",
        when(col("n_bigrams") > 0,
          floor(col("n_rare").cast("double") / col("n_bigrams") * 1000000) / 1000000)
          .otherwise(lit(0.0)))
  }

  /** Count-based bigram language-model scoring — the classic KenLM-
    * style quality signal (the non-neural sibling of the GRU LM's
    * q134): per-doc mean negative log-likelihood of each next token
    * under add-1-smoothed corpus bigram statistics,
    * `-ln((c(w1,w2) + 1) / (c(w1·) + V))`.
    *
    * Scale shape: all statistics stay DISTRIBUTED — bigram and
    * head-token counts are keyed aggregates joined back to the
    * occurrence stream (the [[rarityScore]] shape; a 100k-token vocab
    * has up to 10^10 bigrams, far beyond any broadcast). The one
    * driver scalar is V, a count-distinct aggregate. Probabilities
    * are exact-integer-count ratios in f64, so cross-engine drift is
    * confined to ln() libm ulps — absorbed by the caller's report
    * rounding. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = split(trim(col(textCol)), Tok.WsPlus)
    val bgArr = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", slice(ws, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val occ = df.select(col(idCol), explode(bgArr).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val freq2 = occ.groupBy("bg").agg(count(lit(1)).cast("double").as("c2"))
    val freq1 = occ.groupBy("w1").agg(count(lit(1)).cast("double").as("c1"))
    val v = df.select(explode(call_function("regexp_extract_all",
        col(textCol), lit(Tok.Pattern), lit(0))).as("w"))
      .agg(countDistinct("w")).first().getLong(0).toDouble
    val perDoc = occ
      .join(freq2, Seq("bg"))
      .join(freq1, Seq("w1"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        avg(-log((col("c2") + 1.0d) / (col("c1") + lit(v)))).as("nll"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("nll"), lit(0.0d)).as("nll"))
  }

  /**
   * Interpolated Kneser-Ney bigram scoring — the smoothing KenLM
   * actually ships (Kneser & Ney 1995; Chen & Goodman 1998), beside
   * [[bigramLmScore]]'s add-V baseline: with absolute discount
   * `D = 0.75` (dyadic — exact in binary FP),
   *
   *   P(w2|w1) = (c(w1 w2) − D)/c(w1·)
   *            + (D · N1+(w1 ·)/c(w1·)) · N1+(· w2)/N1+(· ·)
   *
   * where `N1+(w1 ·)` counts distinct continuations of `w1`,
   * `N1+(· w2)` distinct left contexts of `w2` (the continuation
   * probability — "how many contexts has w2 completed", the KN
   * insight), and `N1+(· ·)` distinct bigram types. Scoring the corpus
   * under its own model means every scored bigram has `c >= 1`, so the
   * discounted term stays positive and the `max(·, 0)` clamp never
   * binds (both engines compute the identical unclamped expression).
   * Per-document: `n_bigrams` and `kn_nll = avg(-ln P)` (6-dp, the
   * q153 float-sum discipline). Zero-bigram docs score 0.0.
   *
   * Plan shape: every KN statistic derives from the bigram-TYPE table
   * (`c1 = Σ c2 over w1` — exact: integer-valued doubles sum
   * order-independently; `n1l`/`n1r`/`N1+(··)` are its row counts),
   * so the corpus is scanned exactly twice — once to build the
   * checkpointed type table, once for the scoring join — instead of
   * once per statistic. The type table is vocabulary-bigram-sized
   * (narrow, the [[Dedup]] checkpoint discipline), all further
   * aggregations shuffle only it.
   */
  def knBigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val D = 0.75d
    val ws = split(trim(col(textCol)), Tok.WsPlus)
    val bgArr = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", slice(ws, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val occ = df.select(col(idCol), explode(bgArr).as("bg"))

    val cnt2 = occ.groupBy("bg").agg(count(lit(1)).cast("double").as("c2"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .transform(Checkpoints.cp)
    val cnt1 = cnt2.groupBy("w1").agg(
      sum(col("c2")).as("c1"),
      count(lit(1)).cast("double").as("n1l"))
    val n1r = cnt2.groupBy("w2").agg(
      count(lit(1)).cast("double").as("n1r"))
    val types = cnt2.agg(count(lit(1)).cast("double").as("tt"))

    val p = (col("c2") - lit(D)) / col("c1") +
      (lit(D) * col("n1l") / col("c1")) * (col("n1r") / col("tt"))
    val perDoc = occ
      .join(cnt2.select("bg", "c2", "w1", "w2"), Seq("bg"))
      .join(cnt1, Seq("w1"))
      .join(n1r, Seq("w2"))
      .crossJoin(broadcast(types))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        avg(-log(p)).as("nll"))

    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        round(coalesce(col("nll"), lit(0.0d)), 6).as("kn_nll"))
  }

  /**
   * Frozen Kneser-Ney statistics — the ingest-time artifact of
   * [[knBigramScore]]: the standing corpus's bigram/continuation
   * counts collected once (CAPPED — the [[Bpe]] broadcast-ranks
   * discipline: a loud failure beats a silent driver OOM) and
   * broadcast, so arriving documents score scan-side with ZERO
   * streaming state and never mutate the model (the frozen-quantizer
   * ingest rule). At 100 TB the type table of a trained LM vocabulary
   * is exactly the artifact one ships — bounded by construction, not
   * by the corpus.
   */
  final case class KnStats(
      big: Map[String, Double],
      left: Map[String, (Double, Double)],
      right: Map[String, Double],
      types: Double)

  /** Collect [[KnStats]] from a corpus; fails loudly past `maxTypes`
    * distinct bigrams (size-check BEFORE the collect).
    *
    * 100 TB contract: a web-scale corpus has FAR more than 2M bigram
    * types, so the raw collect is the wrong tool there — set `pruneTo`
    * to keep only the top-N bigrams by count (ties broken by bigram
    * text — a total order, so the artifact is deterministic). The
    * pruned artifact IS the model: its continuation/type counts are
    * those of the kept table, and dropped bigrams score through the
    * same backoff/unseen path as genuinely unseen ones. The prune runs
    * distributed (orderBy + limit = TakeOrderedAndProject — no full
    * sort, no driver pressure beyond the kept N). */
  def knStats(df: DataFrame, textCol: String,
      maxTypes: Int = 2000000, pruneTo: Int = -1): KnStats = {
    val ws = split(trim(col(textCol)), Tok.WsPlus)
    val bgArr = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", slice(ws, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val cnt2all = df.select(explode(bgArr).as("bg"))
      .groupBy("bg").agg(count(lit(1)).cast("double").as("c2"))
      .transform(Checkpoints.cp)
    val cnt2 =
      if (pruneTo > 0) cnt2all.orderBy(col("c2").desc, col("bg")).limit(pruneTo)
      else cnt2all
    // round-20: ONE collect instead of count-then-collect (see
    // Dsir.dsirStats) — the limit caps the driver transfer at
    // maxTypes+1 rows, and CollectLimit keeps collect()'s partition
    // concatenation order, so the order-sensitive c1 accumulation
    // below sees identical rows in the identical order
    val rows = cnt2.limit(maxTypes + 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    require(rows.length <= maxTypes,
      s"over ${rows.length - 1} bigram types exceed the frozen-stats cap $maxTypes — " +
        s"raise the cap, or pass pruneTo to keep the top-N bigrams by count")
    val left = scala.collection.mutable.HashMap.empty[String, (Double, Double)]
    val right = scala.collection.mutable.HashMap.empty[String, Double]
    for ((bg, c2) <- rows) {
      val sp = bg.indexOf(' ')
      val (w1, w2) = (bg.substring(0, sp), bg.substring(sp + 1))
      val (c1, n1l) = left.getOrElse(w1, (0.0, 0.0))
      left(w1) = (c1 + c2, n1l + 1.0)
      right(w2) = right.getOrElse(w2, 0.0) + 1.0
    }
    KnStats(rows.toMap, left.toMap, right.toMap, rows.length.toDouble)
  }

  /**
   * Scan-side KN scoring against a frozen artifact (stream-safe:
   * stateless projection, append mode, no watermark). Seen bigrams
   * score the interpolated formula exactly as [[knBigramScore]];
   * UNSEEN events back off deterministically — unseen bigram:
   * `λ(w1)·Pcont(w2)`; unseen left context: `Pcont(w2)` alone;
   * unseen right word: continuation floor `1/N1+(··)`. `ln` is
   * StrictMath.log (Spark's in-plan `log`), so scoring the frozen
   * corpus itself reproduces [[knBigramScore]] to summation-order
   * ulps (spec-pinned at the 6-dp report precision).
   */
  def withKnFrozen(df: DataFrame, textCol: String, stats: KnStats,
      outCols: (String, String) = ("n_bigrams", "kn_nll")): DataFrame = {
    val D = 0.75
    val bc = df.sparkSession.sparkContext.broadcast(stats)
    val score = udf { (toks: Seq[String]) =>
      val st = bc.value
      var nBg = 0
      var acc = 0.0
      var i = 0
      while (i + 1 < toks.length) {
        val (w1, w2) = (toks(i), toks(i + 1))
        val pc = st.right.get(w2) match {
          case Some(n1r) => n1r / st.types
          case None => 1.0 / st.types
        }
        val p = st.left.get(w1) match {
          case Some((c1, n1l)) =>
            val lambda = D * n1l / c1
            st.big.get(w1 + " " + w2) match {
              case Some(c2) => (c2 - D) / c1 + lambda * pc
              case None => lambda * pc
            }
          case None => pc
        }
        acc += -StrictMath.log(p)
        nBg += 1
        i += 1
      }
      (nBg, if (nBg == 0) 0.0
        else BigDecimal(acc / nBg)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val toks = split(trim(col(textCol)), Tok.WsPlus)
    df.withColumn("__kn", score(toks))
      .withColumn(outCols._1, col("__kn._1"))
      .withColumn(outCols._2, col("__kn._2"))
      .drop("__kn")
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020): within each
   * stratum (their per-language split), rank documents by LM score and
   * cut into `buckets` equal tiles — bucket 1 is the "head" (most
   * fluent), the last the "tail" (likely noise); pipelines keep the
   * head+middle or re-weight by bucket. Scores come from
   * [[bigramLmScore]] (the engine-exact count-based stand-in for
   * KenLM); ranking orders by the 6-dp ROUNDED score with the doc id
   * as the total-order tiebreak, so tile assignment is deterministic
   * and engine-independent (ulp drift in a float sum could otherwise
   * flip the rank of two near-equal docs). NTILE semantics (first
   * `n mod k` tiles one larger) are identical in Spark and standard
   * SQL.
   *
   * Scale: the LM scoring is [[bigramLmScore]]'s keyed joins; the
   * ranking is ONE window per stratum key — a single shuffle on
   * `byCol`, no global sort. Strata counts are corpus-level (a
   * language has millions of docs, the window sorts within
   * partitions); at 100 TB the per-stratum sort is the standard
   * Spark windowed sort-spill, not a driver operation.
   */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String, byCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(df, idCol, textCol)
      .join(df.select(col(idCol), col(byCol)), Seq(idCol))
      .withColumn("nll_r", round(col("nll"), 6))
    scored.withColumn("ppl_bucket",
        ntile(buckets).over(
          Window.partitionBy(byCol).orderBy(col("nll_r"), col(idCol))))
      .select(col(idCol), col(byCol), col("n_bigrams"),
        col("nll_r").as("bigram_nll"), col("ppl_bucket"))
  }
}
