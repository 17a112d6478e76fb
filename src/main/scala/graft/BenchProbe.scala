package graft
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: print EVERY run's timing (not min) for the
  * heavy pair queries, in the round-4 order, to localize the q22
  * anomaly (BENCH_r04: q22=25.0s min-of-2 vs superset q61=3.0s). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
    val names = Seq("q21_jaccard_pairs", "q22_minhash_lsh", "q23_simhash_pairs",
      "q61_dedup_clusters", "q22_minhash_lsh", "q75_retrieval_prep")
    for (name <- names; r <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE $name run$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
