package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("training shards: partitioned layout, round-trip, split pruning") {
    val out = Files.createTempDirectory("graft_shards").toString
    val packed = graft.operators.Pipeline
      .prepareTrainingData(spark.read.parquet(s"$sfDir/documents.parquet"))
    val nIn = packed.count()
    Sink.writeTrainingShards(packed, out, binsPerShard = 2L)

    // layout: split=<s>/shard=<n> directories
    val splits = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.contains("split=")).sorted
    assert(splits.exists(_.endsWith("split=train")) &&
      splits.exists(_.endsWith("split=val")) && splits.exists(_.endsWith("split=test")))
    val trainShards = Files.list(Paths.get(out, "split=train")).toArray
      .map(_.toString).filter(_.contains("shard="))
    assert(trainShards.nonEmpty)

    // round-trip: same rows, partition columns recovered
    val back = spark.read.parquet(out)
    assert(back.count() == nIn)
    val a = packed.select("doc_id", "split", "bin")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = back.select("doc_id", "split", "bin")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)

    ()
  }

  test("compact merges sliver files, preserves rows, survives re-read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString
    // write deliberately fragmented: 64 sliver files
    (0 until 10000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .repartition(64).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    val (nBefore, nAfter) = Sink.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(nBefore == 64 && nAfter == 1, s"$nBefore -> $nAfter")
    val after = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    assert(after.toSeq == before.toSeq)
  }

  test("training shards: pruning details") {
    val out = Files.createTempDirectory("graft_shards2").toString
    val packed = graft.operators.Pipeline
      .prepareTrainingData(spark.read.parquet(s"$sfDir/documents.parquet"))
    Sink.writeTrainingShards(packed, out, binsPerShard = 2L)
    val back = spark.read.parquet(out)
    // split filter prunes partitions at the scan (directory filter)
    val pruned = back.filter(col("split") === "train")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"),
      s"no partition pruning on split:\n$plan")
    assert(pruned.count() == packed.filter(col("split") === "train").count())
  }
}
