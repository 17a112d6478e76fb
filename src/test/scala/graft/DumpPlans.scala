package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for a list of queries to files:
  * `Test/runMain graft.DumpPlans <outDir> <suffix> [q1,q2,...]`
  * (no list = a built-in representative set). Used for the
  * plans/r19/<query>_{before,after}.txt deliverables.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 2) args(2).split(',').toSeq
      else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), p)
        println(s"dumped $n")
      } catch {
        case e: Throwable => println(s"FAILED $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
