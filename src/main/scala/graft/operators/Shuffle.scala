package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, seed-keyed global shuffle for training-data ordering.
 *
 * Training runs need the corpus in a pseudo-random order that is (a)
 * reproducible from a seed, (b) computable without a global sort of
 * 100 TB, and (c) stable under re-runs and partial re-reads (epoch
 * resume). The standard trick: key every row by a cryptographic hash
 * of (seed, id) — md5 here, chosen because every SQL engine agrees on
 * its hex output — then shard by a prefix of the hash and order within
 * shards by the full hash.
 *
 * Scale shape: ONE hash-partition shuffle into `nShards` shards plus a
 * per-shard sort (Spark plans the window as sort-within-partitions
 * after the exchange — no global order, no single-partition window).
 * Shards can be written as separate files and consumed independently;
 * the (shard, pos) pair is a total order for sequential readers.
 */
object Shuffle {

  /** The shuffle key: md5 hex of `seed:id` — identical in Spark and
    * any oracle engine. */
  def shuffleKey(seed: String, id: Column): Column =
    md5(concat(lit(seed), lit(":"), id.cast("string")))

  /**
   * Curriculum ordering: rows enter training phases by a difficulty
   * score (phase = how many `thresholds` the score clears — a
   * scan-side comparison, no percentile shuffle), and order WITHIN a
   * phase is a deterministic seed-keyed shuffle (curriculum schedules
   * fix the phase sequence but randomize within phases). One
   * hash-partition shuffle on `phase` + per-phase sort; phases are
   * consumed in (phase, pos) order by the training reader.
   *
   * @return df plus `phase` (0..thresholds.length) and `pos` (1..n
   *         dense within phase).
   */
  def curriculumOrder(
      df: DataFrame,
      idCol: String,
      score: Column,
      thresholds: Seq[Double],
      seed: String): DataFrame = {
    require(thresholds == thresholds.sorted, "thresholds must be ascending")
    val phase = thresholds.foldLeft(lit(0))((acc, t) =>
      acc + when(score >= t, 1).otherwise(0))
    val key = shuffleKey(seed, col(idCol))
    val w = Window.partitionBy("phase").orderBy(col("__key"), col(idCol))
    df.withColumn("phase", phase)
      .withColumn("__key", key)
      .withColumn("pos", row_number().over(w))
      .drop("__key")
  }

  /**
   * @return df plus `shard` (0..nShards-1) and `pos` (1..len, dense
   *         within shard, ordered by shuffle key; id tiebreak makes
   *         the order total even under md5-collision paranoia).
   */
  def trainShuffle(df: DataFrame, idCol: String, seed: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val key = shuffleKey(seed, col(idCol))
    // shard from the first 8 hex chars (32 bits) — conv's base-16
    // parse of 8 chars cannot overflow a long
    val shard = pmod(conv(substring(key, 1, 8), 16, 10).cast("long"), lit(nShards))
    val w = Window.partitionBy("shard").orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("__key")
  }
}
