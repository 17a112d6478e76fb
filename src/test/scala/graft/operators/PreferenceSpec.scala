package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins [[Preference.pairs]] determinism: smaller-id tie-breaks on
  * BOTH sides, strict-gap filtering, single-response groups dropped. */
class PreferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.Row

  private def run(rows: Seq[(Long, Long, Long)], minGap: Long): Seq[Row] = {
    import spark.implicits._
    Preference.pairs(rows.toDF("p", "id", "score"), "p", "id", "score", lit(minGap))
      .orderBy("p").collect().toSeq
  }

  test("ties resolve to the smaller id on both chosen and rejected sides") {
    // p=1: scores 5,5,1,1 — chosen must be id 10 (not 11), rejected id 20 (not 21)
    val out = run(Seq((1L, 11L, 5L), (1L, 10L, 5L), (1L, 21L, 1L), (1L, 20L, 1L)), 1L)
    assert(out === Seq(Row(1L, 10L, 5L, 20L, 1L, 4L)))
  }

  test("strict-gap filter and single-response groups drop") {
    val out = run(Seq(
      (1L, 1L, 3L), (1L, 2L, 3L), // all-tied group: gap 0 -> dropped
      (2L, 3L, 9L),               // singleton -> dropped (chosen == rejected)
      (3L, 4L, 7L), (3L, 5L, 2L)  // survives
    ), 1L)
    assert(out === Seq(Row(3L, 4L, 7L, 5L, 2L, 5L)))
  }

  test("minGap raises the bar") {
    val base = Seq((1L, 1L, 10L), (1L, 2L, 8L))
    assert(run(base, 2L).nonEmpty)
    assert(run(base, 3L).isEmpty)
  }
}
