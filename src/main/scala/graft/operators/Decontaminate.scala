package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents that share at
 * least `minHits` distinct word n-grams with ANY document of a
 * benchmark/eval corpus — the standard n-gram-overlap contamination
 * check run before training on scraped data.
 *
 * Plan shape: the benchmark's distinct shingle hashes (a small-ish
 * table — eval sets are orders of magnitude smaller than the corpus)
 * are inner-joined against the corpus's inverted shingle index, hits
 * are counted per document, and the verdict is joined back — the
 * corpus text is never shuffled, only (id, 8-byte shingle hash) rows.
 * At 100 TB the benchmark side is broadcast-scale; Spark picks the
 * broadcast automatically under the threshold, and the join stays
 * keyed either way (never a cross product).
 */
object Decontaminate {

  /**
   * @return df's id column plus `n_hits` (distinct contaminated
   *         shingles) and boolean `contaminated`.
   */
  def flagContaminated(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      minHits: Int): DataFrame = {
    require(n >= 1 && minHits >= 1, "n and minHits must be >= 1")
    val spark = df.sparkSession
    val benchShingles = bench
      .select(explode(graft.functions.ShingleHashes
        .shingle_hashes(spark, col(benchTextCol), n)).as("shingle"))
      .distinct()
    val hits = Dedup.shingleHashIndex(df, idCol, textCol, n)
      .join(benchShingles, Seq("shingle"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    df.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }
}
