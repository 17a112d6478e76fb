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
}
