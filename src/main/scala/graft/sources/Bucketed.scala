package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table sink: the co-location primitive for 100 TB joins.
 *
 * Writing both sides of a recurring equi-join bucketed (and sorted)
 * by the join key lets every later join/aggregation on that key read
 * co-located, pre-sorted buckets — Catalyst drops BOTH the shuffle
 * and the sort from the plan (`SortMergeJoin` directly over the
 * scans). At pipeline scale this converts the dominant repeated cost
 * (shuffling the fact table per query) into a one-time write cost.
 *
 * Spark only honors bucketing metadata through the catalog, so this
 * writes a managed/external table (`saveAsTable`), not a bare path.
 */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted table registered as
    * `table`; `path` optional (external table when set). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Convenience read-back (ordinary catalog lookup — the bucketing
    * metadata rides along automatically). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
