package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("profile: nulls, distincts, min/max across numeric, string and timestamp") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option("b"), Option(1.5), Option("2024-01-02 03:04:05.123456")),
      (Option(2L), None, Option(-3.25), Option("2024-01-01 00:00:00")),
      (None, Option("a"), Option(1.5), None),
      (Option(2L), Option("a"), None, Option("2024-12-31 23:59:59")))
      .toDF("k", "s", "v", "t_raw")
      .withColumn("t", to_timestamp(col("t_raw"))).drop("t_raw")

    val p = Profile.profile(df, Seq("k", "s", "v", "t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("k", "s", "v", "t"))

    val k = p("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 2)
    assert(k.getBoolean(4) && k.getDouble(5) == 1.0 && k.getDouble(6) == 2.0)
    assert(k.isNullAt(7) && k.isNullAt(8))

    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) == "a" && s.getString(8) == "b")

    val v = p("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(5) == -3.25 && v.getDouble(6) == 1.5)

    // timestamps surface as exact epoch MICROS (integer-valued double)
    val t = p("t")
    val expectMin = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val expectMax = java.time.Instant.parse("2024-12-31T23:59:59Z")
    def micros(i: java.time.Instant) = i.getEpochSecond * 1000000L + i.getNano / 1000L
    assert(t.getLong(2) == 1 && t.getLong(3) == 3)
    assert(t.getDouble(5) == micros(expectMin).toDouble)
    assert(t.getDouble(6) == micros(expectMax).toDouble)
  }

  test("profile of an all-null column") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val s = Profile.profile(df, Seq("s")).collect().head
    assert(s.getLong(1) == 2 && s.getLong(2) == 2 && s.getLong(3) == 0)
    assert(s.getBoolean(4)) // 0-vs-0 estimate passes the gate
    assert(s.isNullAt(7) && s.isNullAt(8))
  }

  test("plan: sketch aggregates never sit under the multi-distinct Expand") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Profile.profile(df, Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
      .queryExecution.executedPlan.toString
    // the exact pass expands (3 distinct columns), the stats pass joins
    // in via broadcast — two independent aggregate chains
    assert(plan.contains("Expand"), s"multi-distinct should Expand:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stat and distinct passes should broadcast-join:\n$plan")
    // the HLL++ sketch buffers must live in the Expand-free chain: in
    // the tree string the Expand node's subtree (everything printed
    // after it, at deeper indent) must not mention approx_count_distinct
    val afterExpand = plan.substring(plan.indexOf("Expand"))
    assert(!afterExpand.contains("approx_count_distinct"),
      s"sketch buffers keyed by distinct values — the OOM shape:\n$plan")
  }
}
