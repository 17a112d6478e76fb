package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth: the engine's tables round-trip through the
  * other mainstream formats, and partitioned layouts prune at scan. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.EventTime.normalize(spark.read.parquet(s"$sfDir/events.parquet"))
      .withColumn("ts", unix_micros(col("ts"))) // epoch micros: format-stable
  }

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Array[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*)
      .collect().map(_.mkString("|")).sorted
  }

  test("events round-trip parquet -> json -> csv with identical rows") {
    val base = events
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    base.write.mode("overwrite").json(s"$dir/events_json")
    val fromJson = spark.read.schema(base.schema).json(s"$dir/events_json")
    assert(fingerprint(fromJson).sameElements(fingerprint(base)), "json round-trip")

    fromJson.write.mode("overwrite").option("header", "true").csv(s"$dir/events_csv")
    val fromCsv = spark.read.schema(base.schema)
      .option("header", "true").csv(s"$dir/events_csv")
    assert(fingerprint(fromCsv).sameElements(fingerprint(base)), "csv round-trip")
  }

  test("events round-trip orc with identical rows") {
    val base = events
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    base.write.mode("overwrite").orc(s"$dir/events_orc")
    val fromOrc = spark.read.orc(s"$dir/events_orc")
    assert(fromOrc.schema == base.schema, "orc round-trip schema")
    assert(fingerprint(fromOrc).sameElements(fingerprint(base)), "orc round-trip")
  }

  test("partitioned parquet write prunes partitions at scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders_part")

    val all = spark.read.parquet(s"$dir/orders_part")
    val one = all.filter(col("o_year") === 1995)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"year filter not applied as partition filter:\n$plan")

    // pruning must actually reduce files read
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    }
    val prunedFiles = filesRead(one)
    val allFiles = filesRead(all)
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"expected pruning: read $prunedFiles of $allFiles files")

    val expected = orders.filter(col("o_year") === 1995).count()
    assert(one.count() == expected)
  }
}
