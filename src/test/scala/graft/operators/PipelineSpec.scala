package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("composed pipeline: dedup -> filter -> split -> pack is consistent") {
    val out = Pipeline.prepareTrainingData(docs).cache()
    val n = out.count()
    assert(n > 0 && n <= docs.count())

    // no duplicate ids survive
    assert(out.select("doc_id").distinct().count() == n)

    // near-dup clusters collapsed: no surviving pair above threshold
    val residual = Dedup.jaccardPairs(
      out.select("doc_id", "text"), "doc_id", "text", 3, 0.8).count()
    assert(residual == 0, s"$residual near-dup pairs survived")

    // all three splits populated and deterministic
    val splits = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > splits("val"))

    // bins respect the running-sum rule within each split: every bin
    // except a split's last must have been "entered" below capacity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("split").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val checked = out
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0)))
      .withColumn("expected_bin", floor(col("before") / 2048).cast("long"))
      .filter(col("bin") =!= col("expected_bin"))
      .count()
    assert(checked == 0, s"$checked rows with inconsistent bin assignment")

    // quality gate held
    val badQ = out.filter(TextOps.qualityScore(col("text")) < 0.3).count()
    assert(badQ == 0)
    out.unpersist()
  }
}
