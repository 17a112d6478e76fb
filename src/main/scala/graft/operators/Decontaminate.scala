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

  /**
   * Fuzzy (fraction-threshold) decontamination: flag training
   * documents whose OVERLAP FRACTION — distinct contaminated n-grams
   * over the doc's total distinct n-grams — reaches `minFrac`, the
   * GPT-3/PaLM-style contamination rule. Unlike [[flagContaminated]]'s
   * absolute `minHits`, the fraction normalizes for document length:
   * a 10k-gram page sharing 3 boilerplate grams is clean, a 12-gram
   * quiz answer sharing 3 is 25% contaminated.
   *
   * Plan shape: ONE scan-side pass — `shingle_hashes` (already
   * per-doc-distinct) exploded, LEFT-joined against the broadcast
   * benchmark gram set, then a single partial-aggregated groupBy
   * counts total and hit grams together. The corpus text is never
   * shuffled and is read once (vs the two-pass count-then-join
   * alternative); at 100 TB the only exchange is the per-doc count
   * pairs.
   *
   * @return (idCol, n_grams, n_hits, contam_frac, contaminated) for
   *         every corpus doc; zero-gram docs (fewer than n tokens)
   *         have frac 0.0 and are never flagged.
   */
  def contaminationFraction(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      minFrac: Double): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minFrac > 0.0 && minFrac <= 1.0, "minFrac must be in (0, 1]")
    val spark = df.sparkSession
    val benchShingles = bench
      .select(explode(graft.functions.ShingleHashes
        .shingle_hashes(spark, col(benchTextCol), n)).as("shingle"))
      .distinct()
      .withColumn("__hit", lit(1))
    // explode_outer keeps zero-gram docs as a null-shingle row (which
    // can never match the join), so every corpus doc reaches the output
    df.select(col(idCol),
        explode_outer(graft.functions.ShingleHashes
          .shingle_hashes(spark, col(textCol), n)).as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"), "left")
      .groupBy(idCol)
      .agg(
        count(col("shingle")).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .select(col(idCol), col("n_grams"), col("n_hits"),
        when(col("n_grams") > 0, col("n_hits") / col("n_grams"))
          .otherwise(lit(0.0)).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= minFrac)
  }

  /**
   * Bloom-prefiltered decontamination: same verdict as
   * [[flagContaminated]] restricted to the flagged docs, at a fraction
   * of the shuffle. A Bloom filter over the benchmark's distinct gram
   * hashes (a bounded-size sketch, built distributed via
   * `df.stat.bloomFilter` and shipped like a broadcast dim) prefilters
   * the corpus ON THE SCAN: only docs whose gram arrays score >=
   * `minHits` possible-members enter the exact inverted-index join.
   *
   * Correctness: Bloom filters have NO false negatives, so every truly
   * contaminated doc survives the prefilter (bloomHits >= exactHits);
   * false positives are culled by the exact verify join. Output is
   * therefore EXACTLY the contaminated slice of [[flagContaminated]] —
   * `(idCol, n_hits)` with n_hits >= minHits.
   *
   * At 100 TB this is the shape that matters: the exact path shuffles
   * one (id, hash) row per gram of every corpus doc; the bloom path
   * shuffles only the candidate docs' grams — for a benchmark touching
   * ~1e-4 of the corpus, a ~10^4x smaller exchange for one broadcast
   * of a few MB.
   */
  def flagContaminatedBloom(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      minHits: Int,
      fpp: Double = 0.001): DataFrame = {
    require(n >= 1 && minHits >= 1, "n and minHits must be >= 1")
    val spark = df.sparkSession
    val benchShingles = bench
      .select(explode(graft.functions.ShingleHashes
        .shingle_hashes(spark, col(benchTextCol), n)).as("shingle"))
      .distinct()
      // r20: re-key before the checkpoint — the distinct's exchange is
      // byte-light so AQE coalesces it to one partition, and the
      // checkpointed RDD keeps that layout, serializing the bloom
      // build's treeAggregate on one core (bloom insertion is a
      // commutative bitwise OR, so the layout cannot reach the filter)
      .repartition(spark.sessionState.conf.numShufflePartitions, col("shingle"))
      // three consumers (count, bloom build, verify join) — don't
      // re-shingle the benchmark per consumer
      .transform(Checkpoints.cp)
    // expectedNumItems needs a count; one cheap pass over the SMALL
    // side (the benchmark), not the corpus
    val nGrams = benchShingles.count().max(1L)
    val bloom = benchShingles.stat.bloomFilter("shingle", nGrams, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightHits = udf { hs: Seq[Long] =>
      // null text -> null gram array -> 0 hits, matching the exact
      // path (explode of null emits no rows)
      if (hs == null) 0
      else {
        var c = 0
        var i = 0
        while (i < hs.length) { if (bloomBc.value.mightContainLong(hs(i))) c += 1; i += 1 }
        c
      }
    }.asNondeterministic()
    // ^ value is deterministic — the marker stops predicate pushdown
    // from inlining the ShingleHashes projection into the filter (and
    // the scan), which re-shingled every corpus row a second time for
    // the explode below; marked, __sh computes once per row and both
    // consumers read the attribute (the Similarity.pqEncode finding)
    // the prefilter is scan-side: gram hashes are computed in the
    // projection, counted against the broadcast sketch, and only
    // candidate docs (a superset of the true positives) are kept
    val candidates = df
      .select(col(idCol), graft.functions.ShingleHashes
        .shingle_hashes(spark, col(textCol), n).as("__sh"))
      .filter(mightHits(col("__sh")) >= minHits)
    // exact verify on the (tiny) candidate set only
    candidates
      .select(col(idCol), explode(col("__sh")).as("shingle"))
      .join(benchShingles, Seq("shingle"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }
}
