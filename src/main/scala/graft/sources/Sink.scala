package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-shard sink: writes a packed corpus (the
 * [[graft.operators.Pipeline]] output shape) as parquet partitioned by
 * `split` and `shard`, where a shard groups `binsPerShard` consecutive
 * token bins.
 *
 * Why this layout at 100 TB: training loaders want (a) split-level
 * partition pruning (read `split=train` only — a directory filter, no
 * data touched), (b) file-granular shuffling with files big enough to
 * amortize open/seek (binsPerShard controls file size:
 * ~binsPerShard * capacity tokens each), and (c) deterministic
 * placement (bin ranges, not hash buckets — re-running the pipeline
 * yields byte-stable shards). The repartition before the write aligns
 * task boundaries with shard boundaries so each shard directory gets
 * one file instead of one sliver per upstream task.
 */
object Sink {

  def writeTrainingShards(
      packed: DataFrame,
      outDir: String,
      binsPerShard: Long = 64L): Unit = {
    require(binsPerShard >= 1, "binsPerShard must be >= 1")
    packed
      .withColumn("shard", floor(col("bin") / binsPerShard))
      .repartition(col("split"), col("shard"))
      .write
      .partitionBy("split", "shard")
      .mode("overwrite")
      .parquet(outDir)
  }

  /**
   * Small-file compaction: rewrite a parquet directory into
   * `ceil(bytes / targetFileBytes)` files. The perennial data-lake
   * maintenance op — incremental pipelines (per-batch appends,
   * per-trigger streaming sinks) accrete sliver files whose per-file
   * open/footer cost eventually dominates scans; compaction restores
   * scan-sized files. Returns (filesBefore, filesAfter). Writes to a
   * temp sibling then swaps, so a crash mid-compact never leaves the
   * directory half-rewritten.
   */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes >= 1, "targetFileBytes must be >= 1")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum.max(1L)
    val nOut = math.ceil(totalBytes.toDouble / targetFileBytes).toInt.max(1)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)
    (before.size, parquetFiles(path).size)
  }
}
