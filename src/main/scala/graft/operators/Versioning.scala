package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus version diff — the dataset-release audit: given two snapshots
 * keyed by document id, classify every id as `added` (only in the new
 * snapshot), `removed` (only in the old), `changed` (both, content
 * fingerprint differs), or `unchanged`. Every corpus card / release
 * note starts with exactly these four numbers, and incremental
 * pipelines (re-embed only `added`+`changed`) are driven by the row
 * set.
 *
 * Scale shape: ONE full outer join on the id (one shuffle); content
 * comparison by md5 fingerprint so the exchange carries 32-byte
 * hashes, never the document bodies — at 100 TB the diff costs the
 * id-shuffle, not a text-shuffle.
 */
object Versioning {

  /** @return (idCol, status) — `unchanged` rows included only when
    *         `keepUnchanged`. */
  def corpusDiff(
      oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String,
      keepUnchanged: Boolean = false): DataFrame = {
    val a = oldDf.select(col(idCol).as("id"), md5(col(textCol)).as("fp_old"))
    val b = newDf.select(col(idCol).as("id"), md5(col(textCol)).as("fp_new"))
    val joined = a.join(b, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
    if (keepUnchanged) joined else joined.filter(col("status") =!= "unchanged")
  }
}
