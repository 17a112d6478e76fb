package graft

import org.apache.spark.sql.SparkSession

// Dev harness: prints query results at a given SF (used to measure
// the deterministic constants pinned in approximate-op oracles).
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      println(s"=== $q ===")
      SparkEntry.queries(q)(spark, dir).show(50, truncate = false)
    }
    spark.stop()
  }
}
