package graft.operators

import graft.Tok
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generation-eval metrics. BLEU-2 (Papineni et al. 2002) between a
 * candidate and a reference text column: clipped modified n-gram
 * precisions p1/p2 and the brevity-penalized geometric mean
 * `BP · exp((ln p1 + ln p2)/2)`.
 *
 * Scale shape: the clipped counts are (key, gram)-keyed — two
 * explodes, two partial-aggregating groupBys, one equi-join — so the
 * shuffle carries gram COUNT rows, never text, and parallelism follows
 * the gram key space. Zero-overlap candidates get bleu 0 (not −inf);
 * candidates too short for bigrams get NULL p2/bleu — both rules are
 * explicit so an external engine lands on identical values.
 */
object Eval {

  private def grams(c: Column, n: Int): Column = {
    val ws = call_function("regexp_extract_all", c, lit(Tok.Pattern), lit(0))
    if (n == 1) ws
    else when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** @param df one row per (key, candidate, reference)
    * @return keyCol, len1 (cand unigrams), p1, p2, bleu */
  def bleu2(df: DataFrame, keyCol: String, candCol: String,
      refCol: String): DataFrame = {
    def counts(c: Column, n: Int, out: String): DataFrame =
      df.select(col(keyCol), explode(grams(c, n)).as("g"))
        .groupBy(keyCol, "g").agg(count(lit(1)).as(out))
    def clipped(n: Int): DataFrame = {
      val cc = counts(col(candCol), n, "cc")
      val rc = counts(col(refCol), n, "rc")
      cc.join(rc, Seq(keyCol, "g"), "left")
        .groupBy(keyCol)
        .agg(sum("cc").as(s"len$n"),
          sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as(s"clip$n"))
    }
    val u = clipped(1)
    val b = clipped(2)
    val refLen = df.select(col(keyCol),
      size(call_function("regexp_extract_all", col(refCol), lit(Tok.Pattern),
        lit(0))).cast("long").as("rlen"))
    val p1 = when(col("len1").isNull || col("len1") === 0,
        lit(null).cast("double"))
      .otherwise(col("clip1").cast("double") / col("len1").cast("double"))
    val p2 = when(col("len2").isNull || col("len2") === 0,
        lit(null).cast("double"))
      .otherwise(col("clip2").cast("double") / col("len2").cast("double"))
    val bp = when(col("len1") >= col("rlen"), lit(1.0D))
      .otherwise(exp(lit(1.0D) - col("rlen").cast("double")
        / col("len1").cast("double")))
    val bleu = when(col("len2").isNull || col("len2") === 0,
        lit(null).cast("double"))
      .when(col("clip1") === 0 || col("clip2") === 0, lit(0.0D))
      .otherwise(bp * exp((log(p1) + log(p2)) / lit(2.0D)))
    df.select(col(keyCol)).distinct()
      .join(u, Seq(keyCol), "left")
      .join(b, Seq(keyCol), "left")
      .join(refLen.distinct(), Seq(keyCol), "left")
      .select(col(keyCol), col("len1"),
        round(p1, 6).as("p1"),
        round(p2, 6).as("p2"),
        round(bleu, 6).as("bleu"))
  }

  /**
   * ROUGE-N recall (Lin 2004) — the recall complement of [[bleu2]]:
   * the same clipped n-gram overlap, but normalized by the REFERENCE
   * totals, so missing reference content is what costs score (BLEU
   * punishes invented candidate content instead). Same
   * (key, gram)-keyed counting shape.
   *
   * @return keyCol, ref_len (ref unigram total), r1, r2
   */
  def rouge2(df: DataFrame, keyCol: String, candCol: String,
      refCol: String): DataFrame = {
    def counts(c: Column, n: Int, out: String): DataFrame =
      df.select(col(keyCol), explode(grams(c, n)).as("g"))
        .groupBy(keyCol, "g").agg(count(lit(1)).as(out))
    def recall(n: Int): DataFrame = {
      val rc = counts(col(refCol), n, "rc")
      val cc = counts(col(candCol), n, "cc")
      rc.join(cc, Seq(keyCol, "g"), "left")
        .groupBy(keyCol)
        .agg(sum("rc").as(s"rlen$n"),
          sum(least(col("rc"), coalesce(col("cc"), lit(0L)))).as(s"rclip$n"))
    }
    val u = recall(1)
    val b = recall(2)
    def ratio(len: Column, clip: Column): Column =
      when(len.isNull || len === 0, lit(null).cast("double"))
        .otherwise(clip.cast("double") / len.cast("double"))
    df.select(col(keyCol)).distinct()
      .join(u, Seq(keyCol), "left")
      .join(b, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("rlen1"), lit(0L)).as("ref_len"),
        round(ratio(col("rlen1"), col("rclip1")), 6).as("r1"),
        round(ratio(col("rlen2"), col("rclip2")), 6).as("r2"))
  }
}
