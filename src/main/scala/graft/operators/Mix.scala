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
    // keep-rate in 1/10000ths, floor'd — integer thresholds keep the
    // bucket comparison exact across engines
    val rates = counts.crossJoin(broadcast(t))
      .withColumn("__rate_bp",
        floor(col("__p") * col("__T") / col("__n") * 10000).cast("int"))
      .select(col(stratumCol), col("__rate_bp"))

    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(bucket < col("__rate_bp"))
      .drop("__rate_bp")
  }
}
