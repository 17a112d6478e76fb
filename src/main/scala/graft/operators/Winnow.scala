package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Token-level winnowing fingerprints (Schleimer/Wilkerson/Aiken's MOSS
 * scheme, over word k-grams): hash every k-gram, slide a window of
 * `w` consecutive hashes, keep each window's minimum — the classic
 * guarantee is that any shared token run of length >= k + w - 1
 * produces at least one shared fingerprint, so substring-level overlap
 * is detectable from a small per-doc fingerprint set (unlike whole-doc
 * Jaccard, which dilutes a short shared passage below threshold).
 *
 * Hashes are the first 15 hex chars of md5(k-gram) — chosen because
 * both engines compute the identical value, making the operator
 * oracle-checkable end to end.
 */
object Winnow {

  /** Exploded (id, fp) fingerprint pairs, distinct per doc. One native
    * expression pass ([[graft.functions.WinnowFps]]) — the composed
    * higher-order-function form evaluated interpreted per window and
    * re-evaluated the gram-hash array per reference (O(n^2) md5 calls
    * per doc; 230s instead of ~1s for the sf0.1 pair query). */
  def fingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.WinnowFps
        .winnow_fps(df.sparkSession, col(textCol), k, w)).as("fp"))

  /**
   * Candidate substring-overlap pairs: docs sharing >= `minShared`
   * winnowing fingerprints, via the inverted fingerprint index —
   * keyed join on the fingerprint, never a cross product.
   * Output: (a, b, shared), a < b.
   */
  def overlapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      minShared: Long): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w)
      // pin the expansion shuffle width — see Dedup.jaccardPairs
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col("fp"))
      .transform(Checkpoints.cp)
    fps.toDF("ida", "fp").join(fps.toDF("idb", "fp"), Seq("fp"))
      .filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("ida").as("a"), col("idb").as("b"), col("shared"))
  }
}
