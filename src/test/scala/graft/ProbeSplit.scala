package graft
import org.apache.spark.sql.SparkSession
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = Seq("q136_torch_infer", "q05_agg_pricing", "q70_asof_join",
      "q171_torch_swiglu", "q282_torch_kv_window", "q254_torch_spec_loop",
      "q17_tokenize_stats", "q86_sessionize")
    for (n <- names if SparkEntry.queries.contains(n)) {
      // warm
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"$n%-28s build=${(t1-t0)/1e6}%7.1f ms  plan=${(t2-t1)/1e6}%7.1f ms  exec=${(t3-t2)/1e6}%7.1f ms")
      } catch { case e: Throwable => println(s"$n FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
