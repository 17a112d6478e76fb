package graft
import org.apache.spark.sql.SparkSession
/** Dev harness: warm per-query timings outside the full Bench loop. */
object BenchQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    val qs = args.tail
    // warmup
    SparkEntry.queries("q01_scan_star")(spark, dir).collect()
    for (_ <- 0 until 3; q <- qs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).collect().length
      println(f"$q: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
