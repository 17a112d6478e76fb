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

  /** Exploded (id, fp) fingerprint pairs, distinct per doc. */
  def fingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val ws = split(trim(col(textCol)), "\\s+")
    val grams = when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => conv(substring(md5(concat_ws(" ", slice(ws, i, lit(k)))), 1, 15), 16, 10)
          .cast("long")))
      .otherwise(array().cast("array<long>"))
    val mins = when(size(grams) >= w,
      array_distinct(transform(sequence(lit(1), size(grams) - (w - 1)),
        j => array_min(slice(grams, j, lit(w))))))
      .otherwise(array_distinct(grams)) // short docs: every gram is a fingerprint
    df.select(col(idCol), explode(mins).as("fp"))
  }

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
      .localCheckpoint(false)
    fps.toDF("ida", "fp").join(fps.toDF("idb", "fp"), Seq("fp"))
      .filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("ida").as("a"), col("idb").as("b"), col("shared"))
  }
}
