package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-7 scale stress: the two rewritten prefix-sum operators
 * (tokenBudgetSample / curriculumOrder) at millions of rows over a
 * HANDFUL of strata — the exact shape that serialized the old
 * low-cardinality windows — plus the semanticDedup hot-cell guard
 * against a planted 50k-copy mega-cluster (the web-crawl shape).
 *
 * Run: SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.StressR7"
 */
object StressR7 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- token-budget sampling: 4M rows, FOUR strata ----
    // the old per-stratum window put 1M rows on each of 4 tasks; the
    // two-level shape spreads the running sum over (stratum x 65536
    // hex blocks) — record the group count that bounds parallelism
    val rows = spark.range(4000000L)
      .select(col("id"),
        concat(lit("s"), pmod(col("id"), lit(4)).cast("string")).as("src"),
        (pmod(col("id") * 2654435761L, lit(997L)) + 1L).as("toks"))
    val kept = timed("tokenBudgetSample 4M rows / 4 strata, budget 100M") {
      operators.Mix.tokenBudgetSample(rows, "src", "id", col("toks"), 100000000L)
        .groupBy("src").agg(count(lit(1)).as("n"), max("tokens_before").as("mx"))
        .collect()
    }
    for (r <- kept.sortBy(_.getString(0)))
      println(s"[stress] token-budget ${r.getString(0)}: kept=${r.getLong(1)} maxBefore=${r.getLong(2)}")
    val tbGroups = rows
      .withColumn("__blk",
        conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10).cast("int"))
      .select("src", "__blk").distinct().count()
    println(s"[stress] token-budget parallel groups: $tbGroups (vs 4 strata serial before)")

    // ---- curriculum ordering: 4M rows, 3 phases ----
    val cur = timed("curriculumOrder 4M rows / 3 phases") {
      operators.Shuffle.curriculumOrder(
        rows, "id", col("toks").cast("double"), Seq(300.0, 700.0), "r7")
        .groupBy("phase").agg(count(lit(1)).as("n"), max("pos").as("maxpos"))
        .collect()
    }
    for (r <- cur.sortBy(_.getInt(0)))
      println(s"[stress] curriculum phase ${r.getInt(0)}: n=${r.getLong(1)} " +
        s"maxpos=${r.getInt(2)} dense=${r.getLong(1) == r.getInt(2).toLong}")

    // ---- semanticDedup hot cell: 50k copies of ONE vector ----
    // every copy is cosine-1 with every other -> one k-means cell gets
    // 50k rows; the triangle block split (maxCell 8192 -> 7 blocks, 28
    // block-pair tasks) must dedup it to exactly one survivor in
    // bounded time instead of one 1.25B-pair task
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val hot = spark.range(50000L)
      .select((col("id") + 10000000L).as("vec_id"),
        array((0 until dim).map(i => lit(0.5f)): _*).as("embedding"))
    val corpus = emb.unionByName(hot)
    val drops = timed("semanticDedup 50k-copy hot cell + 2k natural, k=64") {
      operators.Similarity.semanticDedup(
        corpus, "vec_id", "embedding", threshold = 0.99, k = 64)
        .filter(col("dropped") && col("id") >= 10000000L).count()
    }
    println(s"[stress] hot-cell drops=$drops (expected exactly 49999: " +
      "all copies but the lowest id)")
    require(drops == 49999L, s"hot-cell dedup wrong: $drops")
    spark.stop()
  }
}
