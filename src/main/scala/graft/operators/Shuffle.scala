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

  /** Order-preserving 65536-way block id from an md5-hex sort key: the
    * first 4 hex chars, parsed exactly (no float rounding). Rows sort
    * by the full key, and a key's block is a monotone prefix of it, so
    * per-block prefix sums + per-block offsets reproduce a global
    * per-partition running total BIT-IDENTICALLY — the two-level trick
    * [[Pack.packBins]] uses, applied to hash-ordered windows. */
  private[operators] def hexBlock(key: Column): Column =
    conv(substring(key, 1, 4), 16, 10).cast("int")

  /**
   * Curriculum ordering: rows enter training phases by a difficulty
   * score (phase = how many `thresholds` the score clears — a
   * scan-side comparison, no percentile shuffle), and order WITHIN a
   * phase is a deterministic seed-keyed shuffle (curriculum schedules
   * fix the phase sequence but randomize within phases). Phases are
   * consumed in (phase, pos) order by the training reader.
   *
   * Scale shape: `pos` is NOT a per-phase window — with 3-5 phases that
   * caps parallelism at the phase count (one multi-TB serial sort per
   * phase at 100 TB). Instead, the same two-level prefix sum as
   * [[Pack.packBins]]: (1) per-(phase, hex-block) counts — an ordinary
   * parallel aggregate; (2) a running offset across the <= 65536 blocks
   * of each phase — a window over the TINY counts table; (3) a
   * block-local row_number plus the broadcast offset — parallel across
   * phases x 65536 blocks. Bit-identical to the naive per-phase window
   * because the block id is a monotone prefix of the sort key
   * (spec-asserted).
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
    val base = df.withColumn("phase", phase)
      .withColumn("__key", shuffleKey(seed, col(idCol)))
      .withColumn("__blk", hexBlock(col("__key")))
    val counts = base.groupBy(col("phase"), col("__blk"))
      .agg(count(lit(1)).as("__bn"))
    val wOff = Window.partitionBy("phase").orderBy(col("__blk").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__boff", coalesce(sum("__bn").over(wOff), lit(0L)))
      .select(col("phase").as("__po"), col("__blk").as("__bo"), col("__boff"))
    // null-safe on __blk: a null id gives a null key/block, which still
    // belongs to its phase (and sorts first, as under orderBy(__key))
    val wIn = Window.partitionBy(col("phase"), col("__blk"))
      .orderBy(col("__key"), col(idCol))
    base.join(broadcast(offsets),
        col("phase") === col("__po") && col("__blk") <=> col("__bo"))
      .withColumn("pos", (col("__boff") + row_number().over(wIn)).cast("int"))
      .drop("__key", "__blk", "__po", "__bo", "__boff")
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
